package graft.fixtures

/** Writes the committed tiny domain + content-type artifacts. Run once:
  *   sbt "runMain graft.fixtures.GenDomainArtifacts"
  */
object GenDomainArtifacts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "src/main/resources/models"
    val dom = s"$dir/domain_tiny.bin"
    val ct = s"$dir/content_tiny.bin"
    graft.classify.DomainClassifier.writeTinyDomainArtifact(dom)
    graft.classify.DomainClassifier.writeTinyContentTypeArtifact(ct)
    val dm = graft.langid.FastTextBin.read(dom)
    val cm = graft.langid.FastTextBin.read(ct)
    println(s"wrote $dom; sports pred = ${dm.predict("zdomzsports some text")}")
    println(s"wrote $ct; news pred = ${cm.predict("zctznews some text")}")
  }
}

package graft.fixtures

/** Writes the committed tiny quality-classifier artifact. Run once:
  *   sbt "runMain graft.fixtures.GenQualityArtifact"
  */
object GenQualityArtifact {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "src/main/resources/models/quality_tiny.bin"
    graft.classify.QualityClassifier.writeTinyArtifact(out)
    val m = graft.langid.FastTextBin.read(out)
    println(s"wrote $out; marker pred = ${m.predict("some text zqualityzmarkerz here")}, plain pred = ${m.predict("plain text only")}")
  }
}

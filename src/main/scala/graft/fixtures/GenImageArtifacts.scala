package graft.fixtures

/** Writes the committed tiny aesthetic/NSFW head artifacts. Run once:
  *   sbt "runMain graft.fixtures.GenImageArtifacts"
  */
object GenImageArtifacts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "src/main/resources/models"
    val aes = s"$dir/aesthetic_tiny.bin"
    val nsfw = s"$dir/nsfw_tiny.bin"
    graft.multimodal.ImageFilters.writeTinyAestheticArtifact(aes)
    graft.multimodal.ImageFilters.writeTinyNsfwArtifact(nsfw)
    val emb = graft.sim.WordVecEmbedder.read("src/main/resources/models/embed_tiny.bin")
      .embed("ztopic3 ztopic11")
    println(s"wrote $aes; score(topics 3,11) = ${graft.multimodal.LinearHead.read(aes).score(emb.toSeq)}")
    println(s"wrote $nsfw; score(topics 3,11) = ${graft.multimodal.LinearHead.read(nsfw).score(emb.toSeq)}")
  }
}

package graft.fixtures

/** Writes the committed tiny word-vector embedding artifact. Run once:
  *   sbt "runMain graft.fixtures.GenEmbedArtifact"
  */
object GenEmbedArtifact {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "src/main/resources/models/embed_tiny.bin"
    graft.sim.WordVecEmbedder.writeTinyArtifact(out)
    val m = graft.sim.WordVecEmbedder.read(out)
    println(s"wrote $out; dim=${m.dim}, vocab=${m.vectors.size}, " +
      s"emb('ztopic0 ztopic9 oov') = ${m.embed("ztopic0 ztopic9 oov").mkString(",")}")
  }
}

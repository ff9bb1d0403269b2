package graft.fixtures

/** Writes the committed tiny prompt-task-complexity artifact. Run once:
  *   sbt "runMain graft.fixtures.GenPtcArtifact"
  */
object GenPtcArtifact {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "src/main/resources/models/ptc_tiny.bin"
    graft.classify.PromptTaskComplexity.writeTinyArtifact(out)
    val m = graft.classify.PromptTaskComplexity.read(out)
    val emb = graft.sim.WordVecEmbedder.read("src/main/resources/models/embed_tiny.bin")
    println(s"wrote $out; score(topics 1,9) = ${m.score(emb.embed("ztopic1 ztopic9").toSeq)}")
    println(s"score(topics 5,12) = ${m.score(emb.embed("ztopic5 ztopic12").toSeq)}")
  }
}

package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.audio.WavIO

/** Executes the REFERENCE'S OWN fleurs audio config
  * (tutorials/audio/fleurs/pipeline.yaml, read-only) end to end over
  * the in-memory FLEURS fixture — manifest → injected ASR → WER →
  * duration → WER-gate → document conversion → jsonl output.
  */
class AudioConfigPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val yaml = "/root/reference/tutorials/audio/fleurs/pipeline.yaml"

  test("the reference fleurs pipeline.yaml runs unchanged over injected seams") {
    assume(new java.io.File(yaml).exists(), "reference tutorials not present")
    // fixture: tar.gz of two wavs + tsv (the AudioSpec fixture)
    val bos = new java.io.ByteArrayOutputStream()
    val tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.util.zip.GZIPOutputStream(bos))
    for ((name, samples) <- Seq(("a.wav", 16000), ("b.wav", 8000))) {
      val bytes = WavIO.buildPcmWav(samples, 16000)
      val e = new org.apache.commons.compress.archivers.tar.TarArchiveEntry(s"dev/$name")
      e.setSize(bytes.length)
      tos.putArchiveEntry(e); tos.write(bytes); tos.closeArchiveEntry()
    }
    tos.close()
    val tarGz = bos.toByteArray
    val fetch: String => Array[Byte] = url =>
      if (url.endsWith(".tsv")) "1\ta.wav\tgood transcript\n2\tb.wav\tsecond text".getBytes("UTF-8")
      else tarGz
    // ASR fixture: perfect on a.wav (1 s → 32044 bytes), garbage on b.wav
    val asr: Array[Byte] => String = b =>
      if (b.length > 20000) "good transcript" else "totally wrong words here"

    val raw = java.nio.file.Files.createTempDirectory("fleurs_cfg").toString
    val out = AudioConfigPipeline.run(spark, yaml,
      overrides = Map("raw_data_dir" -> raw), fetch, asr)

    // wer gate keeps wer <= 75: a.wav has wer 0.0; b.wav 100+ drops
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("audio_filepath") == "a.wav")
    assert(r.getAs[Double]("wer") == 0.0)
    assert(r.getAs[Double]("duration") == 1.0)
    // the binary audio column is gone after AudioToDocumentStage
    assert(!out.columns.contains("audio"))
    // the trailing JsonlWriter wrote ${raw_data_dir}/result
    val result = spark.read.json(s"$raw/result")
    assert(result.count() == 1)
    assert(result.select("text").head.getString(0) == "good transcript")

    // a missing required override still fails loudly
    intercept[IllegalArgumentException] {
      AudioConfigPipeline.run(spark, yaml, Map.empty, fetch, asr)
    }
  }
}

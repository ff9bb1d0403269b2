package graft.audio

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Audio-pipeline stages: WER/CER Python parity (hand-computed
  * editdistance vectors), WAV duration parsing, preserve-by-value,
  * the ASR seam, and the FLEURS acquisition flow on an in-memory
  * fixture.
  */
class AudioSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("edit distance, WER and CER match the reference formulas") {
    assert(AudioMetrics.editDistance("kitten".toIndexedSeq, "sitting".toIndexedSeq) == 3)
    assert(AudioMetrics.editDistance(IndexedSeq.empty[Int], IndexedSeq(1, 2)) == 2)
    // get_wer: word edit distance / ref words * 100, round 2
    assert(AudioMetrics.wer("the cat sat", "the cat sat") == 0.0)
    assert(AudioMetrics.wer("the cat sat", "the bat sat") == 33.33)   // 1/3
    assert(AudioMetrics.wer("a b c d", "a b c") == 25.0)
    // round-half-even: 1/32 words wrong = 3.125 -> 3.12 (Python round)
    assert(AudioMetrics.wer(Seq.fill(32)("w").mkString(" "),
      ("x " + Seq.fill(31)("w").mkString(" "))) == 3.12)
    // get_cer over code points (astral char counts once)
    assert(AudioMetrics.cer("abcd", "abxd") == 25.0)
    assert(AudioMetrics.cer("a😀b", "a😀c") == 33.33) // 3 code points, 1 edit
    // rates
    assert(AudioMetrics.charRate("abcdefgh", 2.0) == 4.0)
    assert(AudioMetrics.wordRate("a b c d", 2.0) == 2.0)
  }

  test("WAV duration: header parse, error sentinel, fixture round trip") {
    val wav = WavIO.buildPcmWav(samples = 16000, sampleRate = 16000)
    assert(WavIO.wavDurationSeconds(wav) == 1.0)
    val wav2 = WavIO.buildPcmWav(samples = 8800, sampleRate = 16000)
    assert(WavIO.wavDurationSeconds(wav2) == 0.55)
    assert(WavIO.wavDurationSeconds("not a wav".getBytes) == -1.0)
    assert(WavIO.wavDurationSeconds(null) == -1.0)
    assert(WavIO.wavDurationSeconds(wav.take(20)) == -1.0)
    // UNTRUSTED chunk sizes: a truncated download declaring a huge
    // data chunk, a size that wraps Int to a no-advance value, and a
    // 3 GB declared chunk must all resolve (no hang/throw)
    val truncated = wav.take(60).toArray
    assert(WavIO.wavDurationSeconds(truncated) >= 0.0) // clamped data
    val evil = wav.clone()
    // overwrite the data chunk size with 0xFFFFFFF8 (toInt == -8)
    val dataOff = 40
    evil(dataOff) = 0xf8.toByte; evil(dataOff + 1) = 0xff.toByte
    evil(dataOff + 2) = 0xff.toByte; evil(dataOff + 3) = 0xff.toByte
    val d = WavIO.wavDurationSeconds(evil) // must terminate
    assert(d >= 0.0 || d == -1.0)
  }

  test("duration + WER + rates stages over a binary audio table; preserve-by-value ops") {
    val rows = Seq(
      (1L, "the quick brown fox", "the quick brown fox", WavIO.buildPcmWav(32000, 16000)),
      (2L, "hello world", "hello word", WavIO.buildPcmWav(8000, 16000)),
      (3L, "bad bytes", "bad bytes", "junk".getBytes))
    val df = rows.toDF("id", "text", "pred_text", "audio")
    val out = AudioStages.withDuration(df)
    val processed = AudioMetrics.withRates(AudioMetrics.withCer(AudioMetrics.withWer(out)))
      .orderBy("id").collect()
    assert(processed(0).getAs[Double]("duration") == 2.0)
    assert(processed(0).getAs[Double]("wer") == 0.0)
    assert(processed(0).getAs[Double]("charrate") == 9.5)  // 19 chars / 2 s
    assert(processed(0).getAs[Double]("wordrate") == 2.0)
    assert(processed(1).getAs[Double]("duration") == 0.5)
    assert(processed(1).getAs[Double]("wer") == 50.0)      // 1 of 2 words
    assert(processed(2).getAs[Double]("duration") == -1.0)
    assert(processed(2).isNullAt(processed(2).fieldIndex("charrate"))) // sentinel -> null rate

    val durations = AudioStages.withDuration(df)
    assert(AudioStages.preserveByValue(durations, "duration", lit(0), "gt")
      .count() == 2) // parse failure dropped
    assert(AudioStages.preserveByValue(durations, "duration", lit(2.0), "eq")
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(AudioStages.preserveByValue(durations, "duration", lit(0.5), "ne").count() == 2)
    intercept[IllegalArgumentException] {
      AudioStages.preserveByValue(durations, "duration", lit(0), "between")
    }
  }

  test("ASR seam + audio->document conversion") {
    val df = Seq((1L, WavIO.buildPcmWav(1600, 16000))).toDF("id", "audio")
    val fakeAsr: Array[Byte] => String = b => s"transcript of ${b.length} bytes"
    val out = AudioStages.withTranscription(df, fakeAsr)
    assert(out.collect()(0).getString(2) == "transcript of 3244 bytes")
    assert(AudioStages.audioToDocument(out, Seq("id", "pred_text")).columns.toSeq ==
      Seq("id", "pred_text"))
  }

  test("FLEURS urls, TSV parse, and manifest over an in-memory fixture") {
    assert(Fleurs.urlList("hy_am", "dev") == Seq(
      "https://huggingface.co/datasets/google/fleurs/resolve/main/data/hy_am/dev.tsv",
      "https://huggingface.co/datasets/google/fleurs/resolve/main/data/hy_am/audio/dev.tar.gz"))
    val tsv = "1\ta.wav\thello there\textra\n\nbad line\n2\tb.wav\tsecond text"
    assert(Fleurs.parseTsv(tsv) == Seq(("a.wav", "hello there"), ("b.wav", "second text")))

    // fixture: tar.gz of two wavs + matching tsv, via injected fetch
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
      if (url.endsWith(".tsv")) "1\ta.wav\tfirst\n2\tb.wav\tsecond".getBytes("UTF-8")
      else tarGz
    val manifest = AudioStages.withDuration(
      Fleurs.initialManifest(spark, "hy_am", "dev", fetch))
    val got = manifest.orderBy("audio_filepath")
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Double]("duration")))
    assert(got.toSeq == Seq(("a.wav", "first", 1.0), ("b.wav", "second", 0.5)))
  }
}

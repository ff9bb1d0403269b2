package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Round-trips a SYNTHETIC torch-format checkpoint (zip of protocol-2
  * pickle + raw little-endian storages, the layout `torch.save`
  * produces) through TorchCheckpoint and the artifact exporters — the
  * deploy-time "convert a real checkpoint" path executed offline.
  */
class TorchExportSpec extends AnyFunSuite {

  /** Emits the opcode stream torch's pickler writes for a state-dict. */
  private final class Pickler {
    val out = new ByteArrayOutputStream()
    def raw(bs: Int*): Unit = bs.foreach(out.write)
    def proto(): Unit = raw(0x80, 0x02)
    def global(module: String, name: String): Unit = {
      out.write('c'); out.write(s"$module\n$name\n".getBytes("UTF-8"))
    }
    def str(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      out.write('X')
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(b.length).array())
      out.write(b)
    }
    def int(v: Int): Unit = {
      out.write('J')
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    }
    def mark(): Unit = raw('(')
    def tuple(): Unit = raw('t')
    def emptyTuple(): Unit = raw(')')
    def reduce(): Unit = raw('R')
    def persid(): Unit = raw('Q')
    def newFalse(): Unit = raw(0x89)
    def setitems(): Unit = raw('u')
    def emptyDict(): Unit = raw('}')
    def stop(): Unit = raw('.')

    /** One _rebuild_tensor_v2 value for storage `key` of `shape`. */
    def tensor(key: String, shape: Seq[Int]): Unit = {
      global("torch._utils", "_rebuild_tensor_v2")
      mark()
      // persistent id ('storage', FloatStorage, key, 'cpu', numel)
      mark(); str("storage"); global("torch", "FloatStorage"); str(key)
      str("cpu"); int(shape.product); tuple(); persid()
      int(0) // storage_offset
      mark(); shape.foreach(int); tuple() // size
      val strides = shape.scanRight(1)(_ * _).tail
      mark(); strides.foreach(int); tuple() // stride
      newFalse() // requires_grad
      global("collections", "OrderedDict"); emptyTuple(); reduce() // hooks
      tuple(); reduce()
    }
  }

  /** Writes a torch-style zip: archive/data.pkl + archive/data/<key>. */
  private def writeCheckpoint(path: String, tensors: Seq[(String, Seq[Int], Array[Float])]): Unit = {
    val p = new Pickler
    p.proto()
    p.global("collections", "OrderedDict"); p.emptyTuple(); p.reduce()
    p.mark()
    tensors.zipWithIndex.foreach { case ((name, shape, _), i) =>
      p.str(name); p.tensor(i.toString, shape)
    }
    p.setitems(); p.stop()

    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    zos.putNextEntry(new java.util.zip.ZipEntry("archive/data.pkl"))
    zos.write(p.out.toByteArray); zos.closeEntry()
    tensors.zipWithIndex.foreach { case ((_, _, data), i) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(s"archive/data/$i"))
      val bb = ByteBuffer.allocate(4 * data.length).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(bb.putFloat)
      zos.write(bb.array()); zos.closeEntry()
    }
    zos.close()
  }

  test("checkpoint loader recovers names, shapes and values") {
    val dir = java.nio.file.Files.createTempDirectory("torch").toString
    val ckpt = s"$dir/model.pt"
    writeCheckpoint(ckpt, Seq(
      ("linear.weight", Seq(1, 4), Array(0.5f, -1.25f, 2.0f, 0.125f)),
      ("linear.bias", Seq(1), Array(0.75f)),
      ("emb.weight", Seq(3, 2), Array(1f, 0f, 0f, 1f, 0.5f, 0.5f))))
    val t = TorchCheckpoint.load(ckpt)
    assert(t.keys.toSeq == Seq("linear.weight", "linear.bias", "emb.weight"))
    assert(t("linear.weight").shape == Seq(1L, 4L))
    assert(t("linear.weight").data.toSeq == Seq(0.5f, -1.25f, 2.0f, 0.125f))
    assert(t("emb.weight").row(2).toSeq == Seq(0.5f, 0.5f))
  }

  test("glin export round-trips through the runtime LinearHead loader") {
    val dir = java.nio.file.Files.createTempDirectory("torch_glin").toString
    val ckpt = s"$dir/head.pt"
    writeCheckpoint(ckpt, Seq(
      ("head.weight", Seq(1, 3), Array(1.0f, 2.0f, -0.5f)),
      ("head.bias", Seq(1), Array(0.25f))))
    ExportArtifacts.main(Array("glin", ckpt, s"$dir/head.bin", "head.weight", "head.bias"))
    val m = graft.multimodal.LinearHead.read(s"$dir/head.bin")
    // 1*1 + 2*2 - 0.5*3 + 0.25 = 3.75
    assert(math.abs(m.score(Seq(1f, 2f, 3f)) - 3.75) < 1e-6)
    // sigmoid flag flows through
    ExportArtifacts.main(Array("glin", ckpt, s"$dir/head_sig.bin", "head.weight", "head.bias", "sigmoid"))
    val ms = graft.multimodal.LinearHead.read(s"$dir/head_sig.bin")
    assert(math.abs(ms.score(Seq(1f, 2f, 3f)) - 1.0 / (1.0 + math.exp(-3.75))) < 1e-9)
  }

  test("gemb export round-trips through the runtime WordVecEmbedder loader") {
    val dir = java.nio.file.Files.createTempDirectory("torch_gemb").toString
    val ckpt = s"$dir/emb.pt"
    writeCheckpoint(ckpt, Seq(
      ("embeddings.weight", Seq(3, 2), Array(3f, 4f, 1f, 0f, 0f, 2f))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/vocab.txt"),
      "alpha\nbeta\ngamma\n".getBytes("UTF-8"))
    ExportArtifacts.main(Array("gemb", ckpt, s"$dir/vocab.txt", s"$dir/emb.bin",
      "embeddings.weight"))
    val m = graft.sim.WordVecEmbedder.read(s"$dir/emb.bin")
    assert(m.dim == 2 && m.vectors.size == 3)
    // single-token doc: mean-pool + L2 normalize -> (0.6, 0.8)
    val e = m.embed("alpha")
    assert(math.abs(e(0) - 0.6f) < 1e-6 && math.abs(e(1) - 0.8f) < 1e-6)
  }

  test("loader parity with Python's OWN pickler (protocols 2 and 4)") {
    // the synthetic writer above uses a fixed opcode sequence; this
    // cross-checks against genuine CPython pickle output (memoization,
    // SHORT_BINUNICODE/MEMOIZE/STACK_GLOBAL on protocol 4) — env-gated
    // on python3 being present
    val python = Seq("python3", "/usr/bin/python3", "/usr/local/bin/python3").find { p =>
      try new ProcessBuilder(p, "-c", "1").start().waitFor() == 0
      catch { case _: java.io.IOException => false }
    }
    assume(python.isDefined, "python3 not available")
    val dir = java.nio.file.Files.createTempDirectory("torch_py").toString
    val script =
      s"""
import pickle, zipfile, struct, io, sys, types, collections
tu = types.ModuleType("torch._utils")
def _rebuild_tensor_v2(*a): pass
tu._rebuild_tensor_v2 = _rebuild_tensor_v2
_rebuild_tensor_v2.__module__ = "torch._utils"
sys.modules["torch._utils"] = tu
torch = types.ModuleType("torch")
class FloatStorage: pass
FloatStorage.__module__ = "torch"
torch.FloatStorage = FloatStorage
sys.modules["torch"] = torch

class Storage:
    def __init__(self, key, numel): self.key, self.numel = key, numel
class Tensor:
    def __init__(self, key, shape): self.key, self.shape = key, shape
    def __reduce_ex__(self, protocol):
        strides, acc = [], 1
        for s in reversed(self.shape): strides.insert(0, acc); acc *= s
        return (_rebuild_tensor_v2,
                (Storage(self.key, acc), 0, tuple(self.shape), tuple(strides),
                 False, collections.OrderedDict()))
class P(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, Storage):
            return ("storage", FloatStorage, obj.key, "cpu", obj.numel)
        return None

sd = collections.OrderedDict()
sd["w.weight"] = Tensor("0", [2, 3])
sd["w.bias"] = Tensor("1", [2])
for proto in (2, 4):
    buf = io.BytesIO()
    P(buf, protocol=proto).dump(sd)
    with zipfile.ZipFile(f"$dir/real_p{proto}.pt", "w", zipfile.ZIP_STORED) as z:
        z.writestr("archive/data.pkl", buf.getvalue())
        z.writestr("archive/data/0", struct.pack("<6f", 1, 2, 3, 4, 5, 6))
        z.writestr("archive/data/1", struct.pack("<2f", 0.5, -0.5))
print("ok")
"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/gen.py"),
      script.getBytes("UTF-8"))
    val proc = new ProcessBuilder(python.get, s"$dir/gen.py").redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assume(proc.waitFor() == 0 && out.contains("ok"), s"python pickling failed: $out")
    for (proto <- Seq(2, 4)) {
      val t = TorchCheckpoint.load(s"$dir/real_p$proto.pt")
      assert(t.keys.toSeq == Seq("w.weight", "w.bias"), s"proto $proto keys")
      assert(t("w.weight").shape == Seq(2L, 3L))
      assert(t("w.weight").data.toSeq == Seq(1f, 2f, 3f, 4f, 5f, 6f), s"proto $proto data")
      assert(t("w.bias").data.toSeq == Seq(0.5f, -0.5f))
    }
  }

  test("gptc export round-trips through the runtime PromptTaskComplexity loader") {
    val dir = java.nio.file.Files.createTempDirectory("torch_gptc").toString
    val ckpt = s"$dir/ptc.pt"
    writeCheckpoint(ckpt, Seq(
      ("task.weight", Seq(2, 2), Array(1f, 0f, 0f, 1f)),
      ("creativity.weight", Seq(2, 2), Array(0.5f, 0f, 0f, 0.5f))))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/spec.json"),
      """{"taskTypes": ["Open QA", "Closed QA"], "taskMatrix": "task.weight",
         "heads": [{"name": "creativity_scope", "matrix": "creativity.weight",
                    "weights": [0.0, 1.0], "divisor": 1.0}]}""".getBytes("UTF-8"))
    ExportArtifacts.main(Array("gptc", ckpt, s"$dir/spec.json", s"$dir/ptc.bin"))
    val m = graft.classify.PromptTaskComplexity.read(s"$dir/ptc.bin")
    assert(m.taskTypes.toSeq == Seq("Open QA", "Closed QA"))
    assert(m.dim == 2 && m.heads.map(_.name) == Seq("creativity_scope"))
    assert(m.heads.head.matrix(0).toSeq == Seq(0.5f, 0f))
  }

  test("ftbin export round-trips through the runtime FastTextBin loader") {
    import graft.langid.FastTextBin
    val dir = java.nio.file.Files.createTempDirectory("torch_ftbin").toString
    val ckpt = s"$dir/ft.pt"
    // supervised checkpoint: 4 words + 8 subword/ngram buckets, 2 labels
    val rnd = new scala.util.Random(7)
    val dim = 3; val nwords = 4; val bucket = 8; val nlabels = 2
    val inData = Array.fill((nwords + bucket) * dim)(rnd.nextFloat() - 0.5f)
    val outData = Array.fill(nlabels * dim)(rnd.nextFloat() - 0.5f)
    writeCheckpoint(ckpt, Seq(
      ("input.weight", Seq(nwords + bucket, dim), inData),
      ("output.weight", Seq(nlabels, dim), outData)))
    // dictionary dump: words (type 0) then labels (type 1), EOS included
    val vocab = Array(
      FastTextBin.Entry("hello", 10, 0), FastTextBin.Entry("world", 8, 0),
      FastTextBin.Entry("spark", 5, 0), FastTextBin.Entry(FastTextBin.EOS, 23, 0),
      FastTextBin.Entry("__label__pos", 12, 1), FastTextBin.Entry("__label__neg", 11, 1))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/dict.tsv"),
      vocab.map(e => s"${e.word}\t${e.count}\t${e.entryType}").mkString("\n").getBytes("UTF-8"))

    ExportArtifacts.main(Array("ftbin", ckpt, s"$dir/dict.tsv", s"$dir/ft.bin",
      "input.weight", "output.weight", "minn=2", "maxn=3", "wordNgrams=2"))

    val loaded = FastTextBin.read(s"$dir/ft.bin")
    assert(loaded.args.dim == dim && loaded.args.bucket == bucket)
    assert(loaded.args.minn == 2 && loaded.args.maxn == 3 && loaded.args.wordNgrams == 2)
    assert(loaded.labels.toSeq == Seq("__label__pos", "__label__neg"))
    // scores identical to a directly-constructed model over the same
    // matrices — the exporter changed representation, not semantics
    def toMatrix(d: Array[Float], cols: Int) = d.grouped(cols).map(_.toArray).toArray
    val direct = new FastTextBin.Model(loaded.args, vocab,
      toMatrix(inData, dim), toMatrix(outData, dim))
    for (text <- Seq("hello world", "spark zzz unknown", "world world hello spark", "")) {
      val a = loaded.predictAll(text); val b = direct.predictAll(text)
      assert(a.map(_._1) == b.map(_._1))
      a.zip(b).foreach { case ((_, pa), (_, pb)) => assert(math.abs(pa - pb) < 1e-12) }
    }
    // subword + word-ngram paths genuinely engage on this fixture
    assert(loaded.lineIds("spark zzz").exists(_ >= nwords), "bucket rows unused")

    // validation: output rows must equal the label count
    val badCkpt = s"$dir/bad.pt"
    writeCheckpoint(badCkpt, Seq(
      ("input.weight", Seq(nwords + bucket, dim), inData),
      ("output.weight", Seq(3, dim), Array.fill(3 * dim)(0f))))
    intercept[IllegalArgumentException] {
      ExportArtifacts.main(Array("ftbin", badCkpt, s"$dir/dict.tsv", s"$dir/bad.bin",
        "input.weight", "output.weight"))
    }
  }
}

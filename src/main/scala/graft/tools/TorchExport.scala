package graft.tools

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** Deploy-time de-risking for the artifact tiers: read a PyTorch
  * checkpoint (`torch.save` zip: `data.pkl` pickled state-dict +
  * per-storage raw little-endian files) WITHOUT Python, and export the
  * tensors into the artifact formats the engine loads at runtime
  * (GLIN linear heads, GEMB word-vector matrices, GPTC multi-head
  * classifiers). The pickle VM below covers the opcode subset
  * `torch.save` emits for plain state-dicts (protocols 2-4; tensors
  * via `torch._utils._rebuild_tensor_v2` + persistent storage ids) —
  * format knowledge is from the public pickle/PyTorch serialization
  * documentation, no reference code involved.
  */
object TorchPickle {

  sealed trait PVal
  case object PNone extends PVal
  final case class PBool(v: Boolean) extends PVal
  final case class PInt(v: Long) extends PVal
  final case class PFloat(v: Double) extends PVal
  final case class PStr(v: String) extends PVal
  final case class PTuple(v: Vector[PVal]) extends PVal
  final case class PList(v: mutable.ArrayBuffer[PVal]) extends PVal
  final case class PDict(v: mutable.LinkedHashMap[PVal, PVal]) extends PVal
  final case class PGlobal(module: String, name: String) extends PVal
  /** A torch storage persistent id: (key, element kind, element count). */
  final case class PStorage(key: String, dtype: String, numel: Long) extends PVal
  /** `_rebuild_tensor_v2(storage, offset, size, stride, ...)`. */
  final case class PTensor(storage: PStorage, offset: Long,
                           shape: Vector[Long], stride: Vector[Long]) extends PVal
  /** Any other constructed object (kept opaque). */
  final case class PObj(cls: PGlobal, args: PVal) extends PVal

  private val storageDtypes = Map(
    "FloatStorage" -> "f4", "DoubleStorage" -> "f8", "HalfStorage" -> "f2",
    "LongStorage" -> "i8", "IntStorage" -> "i4", "ShortStorage" -> "i2",
    "ByteStorage" -> "u1", "BoolStorage" -> "b1")

  private object Mark extends PVal

  def load(data: Array[Byte]): PVal = {
    val b = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val stack = mutable.ArrayBuffer.empty[PVal]
    val memo = mutable.LongMap.empty[PVal]
    def pop(): PVal = stack.remove(stack.length - 1)
    def popToMark(): Vector[PVal] = {
      val i = stack.lastIndexOf(Mark)
      require(i >= 0, "pickle: no MARK on stack")
      val items = stack.slice(i + 1, stack.length).toVector
      stack.remove(i, stack.length - i)
      items
    }
    def readLine(): String = {
      val sb = new StringBuilder
      var c = b.get()
      while (c != '\n') { sb.append(c.toChar); c = b.get() }
      sb.toString
    }
    def readBytes(n: Int): Array[Byte] = { val a = new Array[Byte](n); b.get(a); a }
    def str(n: Int): String = new String(readBytes(n), StandardCharsets.UTF_8)

    def reduce(callable: PVal, args: PVal): PVal = (callable, args) match {
      case (g @ PGlobal("torch._utils", "_rebuild_tensor_v2"), PTuple(a)) if a.length >= 4 =>
        (a(0), a(1), a(2), a(3)) match {
          case (s: PStorage, PInt(off), PTuple(size), PTuple(stride)) =>
            PTensor(s, off,
              size.map { case PInt(i) => i; case v => sys.error(s"size: $v") },
              stride.map { case PInt(i) => i; case v => sys.error(s"stride: $v") })
          case _ => PObj(g, args)
        }
      case (PGlobal("collections", "OrderedDict"), PTuple(a)) =>
        val d = mutable.LinkedHashMap.empty[PVal, PVal]
        a.headOption match { // OrderedDict([(k, v), ...]) form
          case Some(PList(items)) => items.foreach {
            case PTuple(Vector(k, v)) => d(k) = v
            case _ =>
          }
          case _ =>
        }
        PDict(d)
      case (g: PGlobal, _) => PObj(g, args)
      case _ => sys.error(s"pickle: cannot REDUCE $callable")
    }

    def persistent(pid: PVal): PVal = pid match {
      // ('storage', StorageClass, key, location, numel)
      case PTuple(Vector(PStr("storage"), PGlobal(_, cls), PStr(key), _, PInt(n))) =>
        PStorage(key, storageDtypes.getOrElse(cls, sys.error(s"storage type $cls")), n)
      case other => sys.error(s"pickle: unsupported persistent id $other")
    }

    var done = false
    while (!done) {
      val op = b.get() & 0xff
      op match {
        case 0x80 => b.get() // PROTO
        case 0x95 => b.getLong() // FRAME length
        case '.' => done = true // STOP
        case 'N' => stack += PNone
        case 0x88 => stack += PBool(true) // NEWTRUE
        case 0x89 => stack += PBool(false) // NEWFALSE
        case 'J' => stack += PInt(b.getInt().toLong) // BININT
        case 'K' => stack += PInt((b.get() & 0xff).toLong) // BININT1
        case 'M' => stack += PInt((b.getShort() & 0xffff).toLong) // BININT2
        case 0x8a => // LONG1
          val n = b.get() & 0xff
          val bytes = readBytes(n)
          var v = 0L
          for (i <- (n - 1) to 0 by -1) v = (v << 8) | (bytes(i) & 0xffL)
          if (n > 0 && (bytes(n - 1) & 0x80) != 0 && n < 8) v -= 1L << (8 * n)
          stack += PInt(v)
        case 'G' => // BINFLOAT (big-endian double)
          stack += PFloat(java.lang.Double.longBitsToDouble(
            b.order(ByteOrder.BIG_ENDIAN).getLong() match { case l => b.order(ByteOrder.LITTLE_ENDIAN); l }))
        case 'X' => stack += PStr(str(b.getInt())) // BINUNICODE
        case 0x8c => stack += PStr(str(b.get() & 0xff)) // SHORT_BINUNICODE
        case 'c' => stack += PGlobal(readLine(), readLine()) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val module = pop()
          (module, name) match {
            case (PStr(m), PStr(n)) => stack += PGlobal(m, n)
            case _ => sys.error("STACK_GLOBAL: non-string operands")
          }
        case '(' => stack += Mark // MARK
        case ')' => stack += PTuple(Vector.empty) // EMPTY_TUPLE
        case 't' => stack += PTuple(popToMark()) // TUPLE
        case 0x85 => val a = pop(); stack += PTuple(Vector(a)) // TUPLE1
        case 0x86 => val b2 = pop(); val a = pop(); stack += PTuple(Vector(a, b2))
        case 0x87 => val c = pop(); val b2 = pop(); val a = pop(); stack += PTuple(Vector(a, b2, c))
        case ']' => stack += PList(mutable.ArrayBuffer.empty) // EMPTY_LIST
        case 'a' => val v = pop(); stack.last.asInstanceOf[PList].v += v // APPEND
        case 'e' => val items = popToMark(); stack.last.asInstanceOf[PList].v ++= items // APPENDS
        case '}' => stack += PDict(mutable.LinkedHashMap.empty) // EMPTY_DICT
        case 's' => val v = pop(); val k = pop(); stack.last.asInstanceOf[PDict].v(k) = v // SETITEM
        case 'u' => // SETITEMS
          val items = popToMark()
          val d = stack.last.asInstanceOf[PDict]
          items.grouped(2).foreach { case Vector(k, v) => d.v(k) = v; case _ => }
        case 'q' => memo(b.get() & 0xffL) = stack.last // BINPUT
        case 'r' => memo(b.getInt() & 0xffffffffL) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size.toLong) = stack.last // MEMOIZE
        case 'h' => stack += memo(b.get() & 0xffL) // BINGET
        case 'j' => stack += memo(b.getInt() & 0xffffffffL) // LONG_BINGET
        case 'Q' => stack += persistent(pop()) // BINPERSID
        case 'R' => val args = pop(); val f = pop(); stack += reduce(f, args) // REDUCE
        case 0x81 => val args = pop(); val cls = pop(); stack += reduce(cls, args) // NEWOBJ
        case 'b' => // BUILD: merge dict state into a dict obj, else keep obj
          val state = pop()
          (stack.last, state) match {
            case (d: PDict, s: PDict) => d.v ++= s.v
            case _ =>
          }
        case 0x8d => stack += PStr(str(b.getLong().toInt)) // BINUNICODE8
        case other => sys.error(f"pickle: unsupported opcode 0x$other%02x at ${b.position() - 1}")
      }
    }
    stack.last
  }
}

/** A named float tensor lifted out of a checkpoint. */
final case class TorchTensor(shape: Seq[Long], data: Array[Float]) {
  def dim: Int = shape.product.toInt
  def rows: Int = shape.head.toInt
  def cols: Int = if (shape.length > 1) shape(1).toInt else 1
  def row(i: Int): Array[Float] = data.slice(i * cols, (i + 1) * cols)
  def matrix: Array[Array[Float]] = Array.tabulate(rows)(row)
}

object TorchCheckpoint {
  import TorchPickle._

  /** All float tensors of the checkpoint's top-level state-dict,
    * keyed by parameter name (insertion order preserved). Tensors must
    * be contiguous; f4/f8 storages are materialized as float.
    */
  def load(path: String): mutable.LinkedHashMap[String, TorchTensor] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.toVector
      val pklEntry = entries.find(_.getName.endsWith("/data.pkl"))
        .orElse(entries.find(_.getName == "data.pkl"))
        .getOrElse(sys.error(s"$path: no data.pkl — not a torch zip checkpoint"))
      val prefix = pklEntry.getName.stripSuffix("data.pkl")
      def bytesOf(e: java.util.zip.ZipEntry): Array[Byte] = {
        val in = zf.getInputStream(e)
        try in.readAllBytes() finally in.close()
      }
      val root = TorchPickle.load(bytesOf(pklEntry))
      val dict = root match {
        case d: PDict => d.v
        case other => sys.error(s"$path: top-level pickle is $other, expected a state-dict")
      }
      val out = mutable.LinkedHashMap.empty[String, TorchTensor]
      dict.foreach {
        case (PStr(name), t: PTensor) =>
          val e = entries.find(_.getName == s"${prefix}data/${t.storage.key}")
            .getOrElse(sys.error(s"$path: missing storage ${t.storage.key}"))
          val raw = ByteBuffer.wrap(bytesOf(e)).order(ByteOrder.LITTLE_ENDIAN)
          val n = t.shape.product.toInt
          // contiguous row-major only (expected strides from the shape)
          val expected = t.shape.scanRight(1L)(_ * _).tail
          require(t.stride == expected || t.shape.isEmpty,
            s"$name: non-contiguous tensor (stride ${t.stride}, shape ${t.shape})")
          val data = t.storage.dtype match {
            case "f4" =>
              raw.position(t.offset.toInt * 4)
              Array.fill(n)(raw.getFloat())
            case "f8" =>
              raw.position(t.offset.toInt * 8)
              Array.fill(n)(raw.getDouble().toFloat)
            case d => sys.error(s"$name: unsupported storage dtype $d (only f4/f8 export)")
          }
          out(name) = TorchTensor(t.shape, data)
        case _ => // non-tensor entries (metadata) are skipped
      }
      out
    } finally zf.close()
  }
}

/** CLI: `sbt "runMain graft.tools.ExportArtifacts <cmd> ..."`
  *
  *  - `glin <ckpt.pt> <out.bin> <weightName> <biasName> [sigmoid]` —
  *    a linear head (weight `[1,D]` or `[D]`, bias `[1]`) → GLIN.
  *  - `gemb <ckpt.pt> <vocab.txt> <out.bin> <weightName>` — an
  *    embedding matrix `[V,D]` + one vocab token per line → GEMB.
  *  - `gptc <ckpt.pt> <spec.json> <out.bin>` — spec:
  *    `{"taskTypes":[...], "taskMatrix":"name", "heads":[{"name":...,
  *    "matrix":"name", "weights":[...], "divisor":N}]}` → GPTC.
  *  - `ftbin <ckpt.pt> <dict.tsv> <out.bin> <inputName> <outputName>
  *    [k=v ...]` — a supervised fastText checkpoint held as torch
  *    tensors (input matrix `[nwords+bucket, D]`, output matrix
  *    `[nlabels, D]`) + the dictionary dump (`word\tcount\ttype` per
  *    line, type 0 = word / 1 = label, dictionary order) → a fastText
  *    `.bin` the runtime loaders ([[graft.langid.FastTextBin]], i.e.
  *    the reference's fasttext.load_model seam,
  *    filters/fasttext_filter.py:69-77) read directly. Optional k=v:
  *    `minn maxn wordNgrams bucket` (default 0/0/1/inferred).
  */
object ExportArtifacts {
  def main(args: Array[String]): Unit = args.toList match {
    case "glin" :: ckpt :: out :: wName :: bName :: rest =>
      val t = TorchCheckpoint.load(ckpt)
      val w = t(wName); val bias = t(bName).data(0).toDouble
      graft.multimodal.LinearHead.write(out, bias, w.data, rest.contains("sigmoid"))
      println(s"wrote GLIN $out: dim=${w.data.length}, bias=$bias")
    case "gemb" :: ckpt :: vocabPath :: out :: wName :: Nil =>
      val t = TorchCheckpoint.load(ckpt)
      val w = t(wName)
      val vocab = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(java.nio.file.Paths.get(vocabPath)).asScala.toVector
      }
      require(vocab.length == w.rows,
        s"vocab ${vocab.length} lines != ${w.rows} embedding rows")
      graft.sim.WordVecEmbedder.write(out, w.cols, vocab.zipWithIndex.map {
        case (tok, i) => tok -> w.row(i)
      })
      println(s"wrote GEMB $out: vocab=${vocab.length}, dim=${w.cols}")
    case "gptc" :: ckpt :: specPath :: out :: Nil =>
      val t = TorchCheckpoint.load(ckpt)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val spec = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(specPath)))
      import scala.jdk.CollectionConverters._
      val taskTypes = spec.get("taskTypes").elements().asScala.map(_.asText()).toVector
      val taskM = t(spec.get("taskMatrix").asText())
      val heads = spec.get("heads").elements().asScala.map { h =>
        val m = t(h.get("matrix").asText())
        graft.classify.PromptTaskComplexity.ScoreHead(
          h.get("name").asText(), m.matrix,
          h.get("weights").elements().asScala.map(_.asDouble()).toArray,
          h.get("divisor").asDouble())
      }.toSeq
      graft.classify.PromptTaskComplexity.write(out, taskM.cols, taskTypes, taskM.matrix, heads)
      println(s"wrote GPTC $out: ${taskTypes.size} task types, ${heads.size} heads")
    case "ftbin" :: ckpt :: dictPath :: out :: inName :: outName :: opts =>
      val kv = opts.map { o =>
        val Array(k, v) = o.split("=", 2); k -> v.toInt
      }.toMap
      val t = TorchCheckpoint.load(ckpt)
      val inM = t(inName); val outM = t(outName)
      require(inM.cols == outM.cols,
        s"dim mismatch: input ${inM.cols} vs output ${outM.cols}")
      import scala.jdk.CollectionConverters._
      val vocab = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(dictPath))
        .asScala.filter(_.nonEmpty).map { line =>
          val parts = line.split("\t")
          require(parts.length == 3, s"dict line needs word\\tcount\\ttype: $line")
          graft.langid.FastTextBin.Entry(parts(0), parts(1).toLong, parts(2).toByte)
        }.toArray
      val nwords = vocab.count(_.entryType == 0)
      val nlabels = vocab.count(_.entryType == 1)
      require(outM.rows == nlabels,
        s"output matrix rows ${outM.rows} != $nlabels labels (flat softmax only)")
      val bucket = kv.getOrElse("bucket", inM.rows - nwords)
      require(inM.rows == nwords + bucket,
        s"input matrix rows ${inM.rows} != $nwords words + $bucket bucket")
      // loss=3 (softmax) / model=3 (supervised) — the only combination
      // the runtime reader accepts; the remaining args are training-time
      // hyperparameters inference never reads
      val args0 = graft.langid.FastTextBin.Args(
        dim = inM.cols, ws = 5, epoch = 5, minCount = 1, neg = 5,
        wordNgrams = kv.getOrElse("wordNgrams", 1), loss = 3, model = 3,
        bucket = bucket, minn = kv.getOrElse("minn", 0),
        maxn = kv.getOrElse("maxn", 0), lrUpdateRate = 100, t = 1e-4)
      graft.langid.FastTextBin.write(out, args0, vocab, inM.matrix, outM.matrix)
      println(s"wrote fastText bin $out: $nwords words, $nlabels labels, " +
        s"bucket=$bucket, dim=${inM.cols}")
    case _ =>
      System.err.println("usage: glin <ckpt> <out> <weight> <bias> [sigmoid] | " +
        "gemb <ckpt> <vocab.txt> <out> <weight> | gptc <ckpt> <spec.json> <out> | " +
        "ftbin <ckpt> <dict.tsv> <out> <input> <output> [minn=|maxn=|wordNgrams=|bucket=]")
      sys.exit(2)
  }
}

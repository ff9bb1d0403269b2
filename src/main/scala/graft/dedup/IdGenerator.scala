package graft.dedup

import java.nio.file.{Files, Paths}

/** Monotone batch-id registry — the reference's IdGeneratorBase
  * (stages/deduplication/id_generator.py:30-78): each file batch
  * (keyed by the UUIDv5 of its ';'-joined paths under NAMESPACE_URL)
  * registers once and receives a contiguous [min_id, max_id] range;
  * re-registering an already-seen batch returns its EXISTING start id
  * — the resume property that keeps dedup ids stable across reruns.
  * Persists to the reference's exact JSON shape
  * ({"next_id", "batch_registry": {hash: [min, max]}}), so a registry
  * written by either implementation loads in the other.
  *
  * The reference wraps this in a Ray actor for cross-worker
  * serialization; Spark-side the natural home is the DRIVER (register
  * batches when planning file groups, broadcast the ranges), so no
  * actor machinery is needed — per-row ids inside a batch are
  * `range_start + row_number_within_batch`.
  */
final class IdGenerator private (private var _nextId: Long,
                                 registry: scala.collection.mutable.LinkedHashMap[String, (Long, Long)]) {

  def this(startId: Long = 0L) =
    this(startId, scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)])

  def nextId: Long = synchronized(_nextId)

  /** register_batch: existing batches return their original start.
    * Synchronized — the reference gets serialization from its Ray
    * actor; here concurrent driver threads (parallel job planning)
    * must not interleave the read-modify-write and mint overlapping
    * ranges.
    */
  def registerBatch(files: Seq[String], count: Long): Long = synchronized {
    val key = IdGenerator.hashFiles(files)
    registry.get(key) match {
      case Some((min, _)) => min
      case None =>
        val current = _nextId
        _nextId += count
        registry(key) = (current, _nextId - 1)
        current
    }
  }

  /** get_batch_range by files. */
  def batchRange(files: Seq[String]): (Long, Long) =
    synchronized(registry(IdGenerator.hashFiles(files)))

  /** get_batch_range by pre-computed key. */
  def batchRangeByKey(key: String): (Long, Long) = synchronized(registry(key))

  def toDisk(path: String): Unit = synchronized {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("next_id", _nextId)
    val reg = root.putObject("batch_registry")
    registry.foreach { case (k, (min, max)) =>
      val arr = reg.putArray(k)
      arr.add(min); arr.add(max)
    }
    Files.writeString(Paths.get(path), mapper.writeValueAsString(root))
  }
}

object IdGenerator {

  /** uuid.NAMESPACE_URL. */
  private val NamespaceUrl: Array[Byte] =
    Array(0x6b, 0xa7, 0xb8, 0x11, 0x9d, 0xad, 0x11, 0xd1,
      0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  /** uuid5(NAMESPACE_URL, name) — RFC 4122 name-based SHA-1 UUID,
    * byte-compatible with Python's uuid.uuid5 (shared with the video
    * clip ids, which the reference derives the same way).
    */
  def uuid5(name: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(NamespaceUrl)
    md.update(name.getBytes("UTF-8"))
    val h = md.digest().take(16)
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = h.map("%02x".format(_)).mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** hash_files: uuid5 over the ';'-joined paths. */
  def hashFiles(files: Seq[String]): String = uuid5(files.mkString(";"))

  def fromDisk(path: String): IdGenerator = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(path)))
    val reg = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    root.get("batch_registry").fields().forEachRemaining { e =>
      reg(e.getKey) = (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
    }
    new IdGenerator(root.get("next_id").asLong(), reg)
  }
}

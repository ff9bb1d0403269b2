package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

class IdGeneratorSpec extends AnyFunSuite {

  test("hash_files is byte-compatible with Python uuid.uuid5(NAMESPACE_URL, ';'.join)") {
    assert(IdGenerator.hashFiles(Seq("a.parquet", "b.parquet")) ==
      "8c745d1c-5e99-5791-84f3-b1f5d1b032d6")
    assert(IdGenerator.hashFiles(Seq("single.jsonl")) ==
      "52fabca0-37c3-5301-99fc-0fe846651e80")
  }

  test("contiguous ranges, idempotent re-registration, range lookup") {
    val gen = new IdGenerator()
    assert(gen.registerBatch(Seq("a"), 100) == 0)
    assert(gen.registerBatch(Seq("b", "c"), 50) == 100)
    // re-registering an existing batch returns its ORIGINAL start and
    // allocates nothing (the resume property)
    assert(gen.registerBatch(Seq("a"), 100) == 0)
    assert(gen.nextId == 150)
    assert(gen.batchRange(Seq("b", "c")) == (100L, 149L))
    assert(gen.batchRangeByKey(IdGenerator.hashFiles(Seq("a"))) == (0L, 99L))
    intercept[NoSuchElementException](gen.batchRange(Seq("unseen")))
  }

  test("disk roundtrip preserves next_id and every range in the reference JSON shape") {
    val gen = new IdGenerator(1000)
    gen.registerBatch(Seq("x.parquet"), 10)
    gen.registerBatch(Seq("y.parquet", "z.parquet"), 5)
    val p = java.io.File.createTempFile("idgen", ".json").getPath
    gen.toDisk(p)

    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
    assert(json.get("next_id").asLong() == 1015)
    assert(json.get("batch_registry").size() == 2)

    val back = IdGenerator.fromDisk(p)
    assert(back.nextId == 1015)
    assert(back.batchRange(Seq("x.parquet")) == (1000L, 1009L))
    // a batch registered after restore continues from the persisted cursor
    assert(back.registerBatch(Seq("w.parquet"), 3) == 1015)
  }
}

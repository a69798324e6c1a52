package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Memo

/** Session isolation and eviction contract of the shared-lineage memo. */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("same session + key returns the same DataFrame object") {
    val a = Memo(spark, cache = false, "memospec", "same")(spark.range(3).toDF)
    val b = Memo(spark, cache = false, "memospec", "same")(spark.range(99).toDF)
    assert(a eq b, "second touch must hit the memo, not rebuild")
  }

  test("sessions sharing a context never exchange entries") {
    val other = spark.newSession()
    try {
      val a = Memo(spark, cache = false, "memospec", "iso")(spark.range(1).toDF)
      val b = Memo(other, cache = false, "memospec", "iso")(other.range(2).toDF)
      assert(!(a eq b), "distinct sessions must get distinct entries")
      assert(a.sparkSession eq spark)
      assert(b.sparkSession eq other)
    } finally Memo.release(other)
  }

  test("release unpersists cached entries and evicts only that session") {
    val other = spark.newSession()
    val kept = Memo(spark, cache = false, "memospec", "keep")(spark.range(5).toDF)
    val dropped =
      Memo(other, cache = true, "memospec", "drop")(other.range(5).toDF)
    dropped.count() // materialize the cached blocks
    assert(dropped.storageLevel != StorageLevel.NONE)
    Memo.release(other)
    assert(dropped.storageLevel == StorageLevel.NONE,
      "release must unpersist the evicted session's cached blocks")
    val keptAgain =
      Memo(spark, cache = false, "memospec", "keep")(spark.range(77).toDF)
    assert(kept eq keptAgain, "release(other) must not evict this session")
    val rebuilt =
      Memo(other, cache = true, "memospec", "drop")(other.range(5).toDF)
    assert(!(rebuilt eq dropped), "released entry must rebuild on next touch")
    Memo.release(other)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.plans.AsOf

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("custom as-of join exec: hand-checked small case") {
    import spark.implicits._
    val purchases = Seq((7L, 100L, "p1"), (7L, 200L, "p2"), (8L, 150L, "p3"))
      .toDF("user", "t", "tag")
    val clicks = Seq((7L, 90L, 1.0), (7L, 150L, 2.0), (9L, 10L, 9.9))
      .toDF("cuser", "ct", "cv")
    val out = AsOf.asofJoin(purchases, clicks, "user", "cuser", "t", "ct")
      .select($"tag", $"cv").as[(String, Option[Double])].collect().toMap
    assert(out("p1").contains(1.0))  // click@90 <= 100
    assert(out("p2").contains(2.0))  // click@150 is latest <= 200
    assert(out("p3").isEmpty)        // user 8 has no clicks
  }

  test("string keys and null key/time rows") {
    import spark.implicits._
    // nullable string keys + nullable times on both sides
    val left = Seq(
      (Some("a"), Some(100L), "l1"),
      (Some("a"), Some(50L), "l2"),
      (Some("b"), Some(10L), "l3"),
      (None: Option[String], Some(10L), "l4"), // null key -> no match
      (Some("a"), None: Option[Long], "l5")    // null time -> no match
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Some("a"), Some(60L), 1.0),
      (Some("a"), Some(99L), 2.0),
      (Some("c"), Some(1L), 3.0),
      (None: Option[String], Some(5L), 4.0),   // null key: consumed, never matched
      (Some("a"), None: Option[Long], 5.0)     // null time: consumed, never matched
    ).toDF("rk", "rt", "rv")
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rv").as[(String, Option[Double])].collect().toMap
    assert(out("l1").contains(2.0)) // latest a-click <= 100 is rt=99
    assert(out("l2").isEmpty)       // no right a-row <= 50
    assert(out("l3").isEmpty)       // no b rows on the right
    assert(out("l4").isEmpty)       // null key matches nothing
    assert(out("l5").isEmpty)       // null time matches nothing
  }

  test("int keys (non-long orderable type)") {
    import spark.implicits._
    val left = Seq((1, 10L, "x"), (2, 10L, "y")).toDF("k", "t", "tag")
    val right = Seq((1, 5L, 7.5)).toDF("rk", "rt", "rv")
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rv").as[(String, Option[Double])].collect().toMap
    assert(out("x").contains(7.5))
    assert(out("y").isEmpty)
  }

  test("string keys at volume: merge matches a brute-force oracle") {
    import spark.implicits._
    // deterministic pseudo-random fixture — many string keys, interleaved
    // key changes, so the retained matchKey is compared against fresh keys
    // thousands of times (the copyValue path)
    def gen(n: Int, salt: Int) = (0 until n).map { i =>
      val h = (i * 2654435761L + salt) & 0x7fffffffL
      // time = i keeps right-side (key, time) pairs unique -> no tie
      // nondeterminism in the expected answer
      (s"user_${h % 97}", i.toLong, i.toLong)
    }
    val left = gen(5000, 1).toDF("k", "t", "id")
    val right = gen(3000, 2).map { case (k, t, id) => (k, t, id.toDouble) }
      .toDF("rk", "rt", "rv")
    val got = AsOf.asofJoin(left, right, "k", "rk", "t", "rt")
      .select($"id", $"rv").as[(Long, Option[Double])].collect().toMap
    // brute force: latest right row with same key and rt <= t
    val rightRows = gen(3000, 2).map { case (k, t, id) => (k, t, id.toDouble) }
    val byKey = rightRows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.sortBy(_._2)
    }
    gen(5000, 1).foreach { case (k, t, id) =>
      val expect = byKey.get(k).flatMap(_.reverseIterator.find(_._2 <= t)).map(_._3)
      assert(got(id) == expect, s"left id=$id k=$k t=$t")
    }
  }

  test("custom as-of join matches the window-based formulation on events") {
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val ev = Tables.events(spark, d)
      .select($"user_id", $"event_id", $"event_type", $"value",
        unix_micros($"ts").as("tsu"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"tsu")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"tsu".as("c_tsu"), $"value".as("c_value"))
    val custom = AsOf.asofJoin(purchases, clicks, "user_id", "c_user", "tsu", "c_tsu")
      .select($"event_id",
        coalesce($"c_value", lit(-1.0)).as("prev_click_value"),
        coalesce($"c_tsu", lit(-1L)).as("prev_click_tsu"))
      .as[(Long, Double, Long)].collect().map { case (id, v, t) => id -> ((v, t)) }.toMap

    val windowed = graft.operators.Relational.asofJoin(spark, d)
      .select($"event_id", $"prev_click_value", $"prev_click_tsu")
      .as[(Long, Double, Long)].collect().map { case (id, v, t) => id -> ((v, t)) }.toMap

    assert(custom.keySet == windowed.keySet)
    // the window form is strict (< current event); the as-of form is <=.
    // clicks never share a timestamp with a purchase in this data, so
    // the two agree exactly:
    custom.foreach { case (id, vt) => assert(windowed(id) == vt, s"event $id") }
  }
}

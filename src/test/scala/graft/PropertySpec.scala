package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TaxiRide
import graft.functions.Geo
import graft.streaming.Replay

/** Property tests (SURVEY §5.3): grid-cell inverse consistency, serde
  * round-trips, window-count invariance under bounded reordering.
  * (Raw scalacheck generators with fixed seeds — the scalatest bridge
  * artifact isn't in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: mapToGridCell(cellCenter(c)) == c for all grid cells") {
    samples(Gen.choose(0, 250 * 400 - 1), 500).foreach { cell =>
      val lon = Geo.cellCenterLon(cell)
      val lat = Geo.cellCenterLat(cell)
      assert(Geo.mapToGridCell(lon, lat) == cell, s"cell $cell")
    }
  }

  val genRide: Gen[TaxiRide] = for {
    id <- Gen.choose(1L, 1000000L)
    isStart <- Gen.oneOf(true, false)
    startSec <- Gen.choose(0L, 2000000000L)
    durSec <- Gen.choose(0L, 7200L)
    lon1 <- Gen.choose(-74.05f, -73.7f)
    lat1 <- Gen.choose(40.5f, 41.0f)
    lon2 <- Gen.choose(-74.05f, -73.7f)
    lat2 <- Gen.choose(40.5f, 41.0f)
    cnt <- Gen.choose(0, 8)
  } yield TaxiRide(id, isStart,
    new Timestamp(startSec * 1000), new Timestamp((startSec + durSec) * 1000),
    lon1, lat1, lon2, lat2, cnt.toShort)

  test("property: taxi serde round-trips arbitrary rides (incl. time swap)") {
    samples(genRide, 300).foreach { ride =>
      val parsed = TaxiRide.fromString(ride.toCsvString)
      assert(parsed == ride, ride.toCsvString)
      assert(parsed.eventTime == (if (ride.isStart) ride.startTime else ride.endTime))
    }
  }

  test("property: replay delay bound holds for any seed") {
    val rides = (1 to 60).map(i => TaxiRide(i, isStart = true,
      new Timestamp(1357000000000L + i * 7000L), new Timestamp(0),
      -73.98f, 40.75f, -73.9f, 40.8f, 1))
    samples(Gen.choose(0L, 100000L), 50).foreach { seed =>
      val replayed = Replay.withBoundedDelay(rides, maxDelaySecs = 60, seed = seed)
      assert(replayed.toSet == rides.toSet)
      val times = replayed.map(_.eventTime.getTime)
      for (i <- times.indices; j <- i + 1 until times.length)
        assert(times(i) - times(j) <= 60000L, s"seed $seed at $i,$j")
    }
  }

  test("property: window counts are invariant under input permutation (W1)") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val rides = (1 to 40).map(i => TaxiRide(i, isStart = true,
      new Timestamp(1357000000000L + i * 90000L), new Timestamp(0),
      -73.98f, 40.75f, -73.9f, 40.8f, 1))
    def counts(rs: Seq[TaxiRide]) =
      graft.streaming.TaxiStreams.popularPlaces(
        rs.toDS().toDF().withColumn("eventTime", $"startTime"), threshold = 1)
        .as[(Float, Float, Timestamp, Boolean, Long)].collect().toSet
    val base = counts(rides)
    assert(base.nonEmpty)
    Seq(1L, 7L, 42L).foreach { seed =>
      assert(counts(new scala.util.Random(seed).shuffle(rides)) == base, s"seed $seed")
    }
  }

  test("property: Morton interleave is a bijection on 16-bit pairs (q164)") {
    def interleave(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) +
        (((y >> i) & 1L) << (2 * i + 1))).sum
    def deinterleave(z: Long): (Long, Long) = (
      (0 until 16).map(i => ((z >> (2 * i)) & 1L) << i).sum,
      (0 until 16).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum)
    val pairs = samples(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)), 500)
    pairs.foreach { case (x, y) =>
      val z = interleave(x, y)
      assert(z >= 0L && z < (1L << 32))
      assert(deinterleave(z) == ((x, y)), s"($x,$y)")
    }
    // the q164 block property: fixing the top 3 z-bits bounds both dims
    pairs.foreach { case (x, y) =>
      val block = interleave(x, y) >> 29
      // bit 31 = y's bit 15, bit 30 = x's bit 15, bit 29 = y's bit 14
      assert((block >> 2) == (y >> 15), s"y top bit in block for ($x,$y)")
      assert(((block >> 1) & 1L) == (x >> 15), s"x top bit for ($x,$y)")
    }
  }

  test("property: Misra-Gries guarantee holds on adversarial random streams") {
    val gen = Gen.listOfN(400, Gen.frequency(
      (6, Gen.choose(0L, 3L)),      // heavy ids
      (4, Gen.choose(100L, 199L)))) // long tail
    samples(gen, 20).zipWithIndex.foreach { case (ids, i) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
      val evs = ids.zipWithIndex.map { case (id, j) =>
        graft.streaming.EventStreams.Event(j.toLong,
          new Timestamp(1357000000000L + j * 1000L), id, "e", 0.0)
      }
      val n = graft.streaming.EventStreams.mgFold(m, 8, evs)
      assert(n == ids.length.toLong)
      assert(m.size <= 8)
      val exact = ids.groupBy(identity).view.mapValues(_.length.toLong)
      val mustHave = exact.filter(_._2 > n / 8).keys.toSet
      assert(mustHave.subsetOf(m.keySet), s"sample $i: ${mustHave -- m.keySet}")
      // MG counters never overcount
      m.foreach { case (id, c) => assert(c <= exact(id), s"sample $i id $id") }
    }
  }

  test("property: CMS point estimates never undercount (q162)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(r: Int, k: Long): Int = {
      val hex = md.digest(s"cms:$r:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % 256).toInt
    }
    val gen = Gen.listOfN(300, Gen.choose(0L, 49L))
    samples(gen, 20).zipWithIndex.foreach { case (ids, i) =>
      val regs = Array.ofDim[Long](4, 256)
      ids.foreach(k => (0 until 4).foreach(r => regs(r)(h(r, k)) += 1L))
      val exact = ids.groupBy(identity).view.mapValues(_.length.toLong)
      exact.foreach { case (k, c) =>
        val est = (0 until 4).map(r => regs(r)(h(r, k))).min
        assert(est >= c, s"sample $i key $k: est $est < exact $c")
      }
    }
  }
}

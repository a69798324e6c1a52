package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("binary media table round-trips payload and typed metadata") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.content.nonEmpty && r.meta.mediaType == "image"))
    assert(rows.forall(r => r.meta.width >= 1 && r.meta.width <= 64))
  }

  test("feature extraction: deterministic stub decode over partitions") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.doc_id -> f).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(5).foreach { case (id, text) =>
      val f = feats(id)
      assert(f.n_bytes == text.getBytes("UTF-8").length)
      assert(f.histogram.sum == f.width.toLong * f.height) // padded grid
      // mean pixel of ASCII text bytes sits in the printable range
      assert(f.mean_px > 0 && f.mean_px < 255)
    }
  }

  test("resize stub produces requested dimensions") {
    val img = Array.tabulate(10, 8)((y, x) => y * 8 + x)
    val out = Multimodal.resizeStub(img, 4, 5)
    assert(out.length == 5 && out.forall(_.length == 4))
    assert(out(0)(0) == img(0)(0)) // nearest-neighbor keeps origin
  }

  test("frame sampling emits every Nth frame deterministically") {
    import spark.implicits._
    val media = Seq(MediaRecord(1L, Array.range(0, 40).map(_.toByte),
      MediaMeta("video", "fake", 10, 0, 1000L, "mem://v/1"))).toDS()
    val frames = Multimodal.sampleFrames(media, everyN = 2)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    // 40 bytes / 10-byte frames = 4 frames; every 2nd → idx 0, 2
    assert(frames.map(_._2).toSeq == Seq(0, 2))
    assert(frames.head._3.toSeq == (0 until 10).map(_.toByte))
  }
}

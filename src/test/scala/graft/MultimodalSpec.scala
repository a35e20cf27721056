package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Plumbing tests for the multimodal BINARY pipeline: header round-trip,
  * decode, histogram, resize, frame slicing — all partition-local. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = mediaTable(spark, sf0).cache()

  test("media header round-trips through decode") {
    val d = decode(media).collect()
    assert(d.nonEmpty)
    d.take(50).foreach { dec =>
      assert(dec.kind === kindOf(dec.doc_id))
      assert(dec.width === widthOf(dec.doc_id))
      assert(dec.height === heightOf(dec.doc_id))
      assert(dec.channels === channelsOf(dec.doc_id))
    }
  }

  test("real codec boundary is a marked stub") {
    intercept[UnsupportedOperationException](Multimodal.realDecode(Array[Byte]()))
  }

  test("byte histogram counts sum to payload length") {
    val rows = byteHistogram(decode(media)).as[(Long, Array[Long])].collect()
    val lens = decode(media).collect().map(d => d.doc_id -> d.pixels.length).toMap
    rows.take(50).foreach { case (id, hist) =>
      assert(hist.sum === lens(id).toLong, s"doc $id")
    }
  }

  test("resize contracts payload by the factor") {
    val before = decode(media).collect().map(d => d.doc_id -> d.pixels.length).toMap
    resize(decode(media), 4).collect().take(50).foreach { d =>
      assert(d.pixels.length === math.ceil(before(d.doc_id) / 4.0).toInt)
    }
  }

  test("frame sample reassembles to the original payload") {
    val frames = frameSample(media).collect().groupBy(_.doc_id)
    val payloads = decode(media).collect()
      .filter(_.kind == "video").map(d => d.doc_id -> d.pixels).toMap
    assert(frames.keySet === payloads.keySet)
    frames.take(20).foreach { case (id, fs) =>
      val glued = fs.sortBy(_.frame_no).flatMap(_.frame)
      assert(glued.toSeq === payloads(id).toSeq, s"doc $id")
    }
  }
}

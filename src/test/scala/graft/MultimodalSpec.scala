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

  test("ImageIoCodec decodes a real PNG through the same operators") {
    // encode a real 8x4 RGB PNG in memory with javax.imageio, ship it as
    // MediaRow BINARY, decode with the REAL codec, and run the decoded
    // rows through the unchanged downstream operators
    val w = 8; val h = 4
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 32 << 16) | (y * 64 << 8) | 0x10)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    val media = Seq(MediaRow(1L, "image", png)).toDS()
    val d = decodeWith(media, ImageIoCodec).collect().head
    assert((d.width, d.height, d.channels) === ((w, h, 3)))
    assert(d.pixels.length === w * h * 3)
    // pixel exactness: PNG is lossless, so getRGB round-trips our values
    assert((d.pixels(0) & 0xff, d.pixels(1) & 0xff, d.pixels(2) & 0xff)
      === ((0, 0, 0x10)))
    val last = (h - 1) * w + (w - 1) // row-major index of (7,3)
    assert((d.pixels(3 * last) & 0xff) === 7 * 32)
    assert((d.pixels(3 * last + 1) & 0xff) === 3 * 64)

    // same downstream operators as the fake codec path
    val hist = byteHistogram(decodeWith(media, ImageIoCodec))
      .as[(Long, Array[Long])].collect().head._2
    assert(hist.sum === (w * h * 3).toLong)
    val small = resize(decodeWith(media, ImageIoCodec), 4).collect().head
    assert(small.width === w / 4 && small.height === 1)
    assert(small.pixels.length === math.ceil(w * h * 3 / 4.0).toInt)

    // non-image bytes fail loudly at the boundary, not downstream
    intercept[Exception] {
      decodeWith(Seq(MediaRow(2L, "image", Array[Byte](1, 2, 3))).toDS(),
        ImageIoCodec).collect()
    }
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

  test("blockhash: identical payloads collide, one-byte edits stay near, random payloads are far") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val base = "the quick brown fox jumps over the lazy dog and keeps going " * 4
    val edited = base.dropRight(1) + "!"
    val other = "entirely different content with other words repeated often " * 4
    val sigs = Seq((1L, base), (2L, base), (3L, edited), (4L, other))
      .toDF("id", "t")
      .select(col("id"), expr("graft_blockhash(encode(t, 'UTF-8'), 64)").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L), "identical payloads must hash identically")
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(near <= 7, s"one-byte edit moved $near bits")
    assert(far > near, "unrelated payload should be farther than a 1-byte edit")
    // short payloads (< bits bytes) hash to NULL, not a colliding sentinel
    val short = Seq((9L, "tiny")).toDF("id", "t")
      .select(expr("graft_blockhash(encode(t, 'UTF-8'), 64)")).head()
    assert(short.isNullAt(0))
  }

  test("hammingNearDup on blockhash signatures finds planted media pairs") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val docs = (1L to 40L).map(i =>
      (i, s"content block number $i with enough bytes to cross the threshold " * 3))
    val copies = docs.filter(_._1 % 4 == 0).map { case (i, t) => (i + 1000L, t) }
    val sigs = (docs ++ copies).toDF("doc_id", "t")
      .select(col("doc_id"), expr("graft_blockhash(encode(t, 'UTF-8'), 64)").as("sig"))
    val pairs = operators.Dedup.hammingNearDup(sigs, maxHamming = 0, bands = 8, bits = 64)
      .as[(Long, Long, Int)].collect().toSeq
    copies.foreach { case (cid, _) =>
      assert(pairs.contains((cid - 1000L, cid, 0)), s"missing planted pair for $cid")
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

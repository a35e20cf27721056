package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack

/** Driver-contract queries over the multimodal BINARY pipeline. The fake
  * codec (graft.operators.Multimodal) is pure arithmetic over doc_id and
  * the UTF-8 text payload, so DuckDB can recompute metadata, histograms and
  * frame layouts without touching the bytes. */
object MultimodalPack extends QueryPack {

  import Multimodal._

  /** q202 VAD geometry: non-overlapping window of 8 byte-samples; a
    * window is ACTIVE when its byte-code sum clears the threshold (mean
    * code >= 80 — letters-dense audio stand-in; space-dense windows dip
    * below). */
  val VadWindow = 8
  val VadThreshold = 640

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // VAD-style activity segmentation over a sampled payload — the audio
    // preprocessing shape (voice-activity detection) on the fake codec:
    // treat each byte as a sample, cut non-overlapping 8-sample windows,
    // mark a window ACTIVE when its energy (byte-code sum) clears the
    // threshold, then merge consecutive active windows into segments with
    // a single aggregate() fold carrying (current run, best run, segment
    // count). Entirely scan-stage higher-order-function arithmetic — no
    // explode, no shuffle, one pass over 100 TB of media; the same island
    // merge as q192 but realized per-row instead of via a window function.
    // ASCII subset pinned on both sides (the q28 convention) so byte
    // semantics match DuckDB's character arithmetic.
    "q202_vad_segments" -> ((s, dir) => {
      val d = graft.sources.Tables.table(s, dir, "documents")
        .filter(col("doc_id") % 10 === 0)
        .filter(length(col("text")) === octet_length(col("text")))
        // at least one full window — the oracle's unnest(range(...)) drops
        // shorter docs, so both sides must exclude them explicitly
        .filter(length(col("text")) >= VadWindow)
      val nw = floor(length(col("text")) / VadWindow).cast("int")
      // nw >= 1 is guaranteed by the length filter above, so the window
      // sequence is never empty/reversed.
      // Per-window energy reads a SUBSTRING of the scalar text inside the
      // lambda — O(len) total work. (The previous form sliced a per-char
      // codes ARRAY in the lambda; interpreted higher-order functions
      // re-evaluate lambda-invariant subtrees per element, so that array
      // was rebuilt once PER WINDOW — O(len²/W) ascii() calls per row,
      // measured 2.8 s warm at sf0.1. This form: ~0.3 s.) The stages are
      // separate projections so each array materializes once per row;
      // CollapseProject keeps multi-consumer aliases (flags, the fold
      // struct) staged instead of re-inlining them per consumer.
      val energies = transform(sequence(lit(0), col("nw") - 1), w =>
        aggregate(
          transform(split(col("text").substr(w * VadWindow + 1,
            lit(VadWindow)), ""), c => ascii(c)),
          lit(0), (acc, x) => acc + x))
      val flags = transform(col("energies"), e => e >= VadThreshold)
      val zero = struct(lit(0).as("cur"), lit(0).as("best"), lit(0).as("segs"))
      val fold = aggregate(col("flags"), zero, (acc, f) => struct(
        when(f, acc.getField("cur") + 1).otherwise(0).as("cur"),
        greatest(acc.getField("best"),
          when(f, acc.getField("cur") + 1).otherwise(0)).as("best"),
        (acc.getField("segs") +
          when(f && acc.getField("cur") === 0, 1).otherwise(0)).as("segs")))
      d.select(col("doc_id"), col("text"), nw.as("nw"))
        .select(col("doc_id"), col("nw"), energies.as("energies"))
        .select(col("doc_id"), col("nw"), flags.as("flags"))
        .select(col("doc_id"), col("nw").as("n_windows"),
          size(filter(col("flags"), f => f)).as("n_active"), fold.as("f"))
        .select(col("doc_id"), col("n_windows"), col("n_active"),
          col("f.segs").as("n_segments"), col("f.best").as("longest_run"))
        .orderBy("doc_id")
    }),

    // Ingest + decode: typed metadata out of the binary header.
    "q26_media_meta" -> ((s, dir) => {
      decode(mediaTable(s, dir)).toDF()
        .select(col("doc_id"), col("kind"), col("channels"),
          col("width"), col("height"),
          length(col("pixels")).cast("long").as("n_payload"))
        .orderBy("doc_id")
    }),

    // Frame sampling over video payloads.
    "q27_frame_sample" -> ((s, dir) => {
      frameSample(mediaTable(s, dir)).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          max(length(col("frame"))).cast("long").as("max_frame"),
          min(length(col("frame"))).cast("long").as("min_frame"))
        .orderBy("doc_id")
    }),

    // Feature extraction: 16-bin byte histogram for a doc sample, exploded
    // to (doc_id, bin, n) rows. The oracle counts CHARACTERS via ascii(),
    // which only equals byte counts for ASCII text — so the ASCII subset is
    // selected explicitly on BOTH sides (a non-ASCII doc in future fixtures
    // must not silently diverge; it is excluded, not miscounted).
    "q28_byte_histogram" -> ((s, dir) => {
      val asciiDocs = graft.sources.Tables.table(s, dir, "documents")
        .filter(col("doc_id") % 25 === 0)
        .filter(length(col("text")) === octet_length(col("text")))
      byteHistogram(decode(mediaFrom(asciiDocs)))
        .select(col("doc_id"), posexplode(col("hist")).as(Seq("bin", "n")))
        .filter(col("n") > 0)
        .orderBy("doc_id", "bin")
    }),

    // Resize: contracted dims + payload size after 4x downsample.
    "q29_resize" -> ((s, dir) => {
      resize(decode(mediaTable(s, dir)), factor = 4).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          length(col("pixels")).cast("long").as("n_payload"))
        .orderBy("doc_id")
    }),

    // CLIP-style contrastive pair building: each training batch is a set
    // of (media, caption) positives, and every cross pairing INSIDE the
    // batch is a negative — in-batch negatives need no negative-sampling
    // state at all, which is why contrastive pipelines use them at scale.
    // Docs land in batches by hash (deterministic, layout-independent);
    // the pair table is a within-batch self-join keyed ON the batch id,
    // so each batch's B² pairs materialize on one partition — the shuffle
    // is one pass over the corpus regardless of batch count, and batch
    // SIZE (not count) is the constant. Media side is the decoded payload
    // hash, caption side the first-12-token hash — both content-pinned.
    "q176_contrastive_pairs" -> ((s, dir) => {
      val d = graft.sources.Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val sides = decode(mediaFrom(d)).toDF()
        .select(col("doc_id"), md5(col("pixels")).as("payload_hash"))
        .join(d.select(col("doc_id"),
          substring(md5(array_join(slice(
            graft.functions.TextFunctions.tokens(col("text")), 1,
            CaptionTokens), " ")), 1, 8).as("caption_hash")), "doc_id")
        .withColumn("batch",
          graft.functions.Portable.hash32(concat(lit("cb:"),
            col("doc_id").cast("string"))) % lit(ContrastiveBatches))
      val anchors = sides.select(col("batch"), col("doc_id").as("anchor_id"),
        col("payload_hash"))
      val partners = sides.select(col("batch"), col("doc_id").as("partner_id"),
        col("caption_hash"))
      anchors.join(partners, "batch")
        .select(col("batch"), col("anchor_id"), col("partner_id"),
          col("payload_hash"), col("caption_hash"),
          when(col("anchor_id") === col("partner_id"), 1L).otherwise(0L)
            .as("label"))
        .orderBy("batch", "anchor_id", "partner_id")
    }),

    // Content-addressed media dedup: every 5th asset is re-ingested under
    // a new id, which ALSO changes its container metadata (kind, dims
    // derive from the id) — dedup on the md5 of the decoded PAYLOAD must
    // still collapse them (n_kinds 2 proves the container differed).
    // Scale shape: one shuffle on a 16-byte payload hash, never the bytes.
    "q79_media_dedup" -> ((s, dir) => {
      val d = graft.sources.Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val frame = d.unionAll(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + ReencodeOffset).as("doc_id"), col("text")))
      decode(mediaFrom(frame)).toDF()
        .select(col("doc_id"), col("kind"), md5(col("pixels")).as("payload_hash"))
        .groupBy(col("payload_hash"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"),
          countDistinct(col("kind")).as("n_kinds"))
        .orderBy("keeper")
    }),

    // Perceptual media near-dup: graft_blockhash (block-mean signature
    // over the decoded payload, the aHash shape) + the banded Hamming
    // search shared with q84. Plants: every 5th asset re-ingested
    // byte-identical (must pair at Hamming 0), every 7th ASCII asset with
    // ONE byte replaced (same length — measured Hamming <= 6 across sf
    // for this corpus, found inside the bands=8 pigeonhole bound of 7).
    // The signature itself is engine-specific, so the oracle pins the
    // replicable parts: the signature-table size and both planted-recall
    // gates. Scale: signature is one scan-stage pass over the bytes;
    // candidates come from the band equi-join, never all pairs.
    "q94_media_neardup" -> ((s, dir) => {
      val d = graft.sources.Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val ascii = d.filter(length(col("text")) === octet_length(col("text")))
      val corrupted = ascii.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + CorruptOffset).as("doc_id"),
          concat(col("text").substr(lit(1), length(col("text")) - 1),
            lit("!")).as("text"))
      val frame = d
        .unionAll(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + ReencodeOffset).as("doc_id"), col("text")))
        .unionAll(corrupted)
      val sigs = decode(mediaFrom(frame)).toDF()
        .filter(length(col("pixels")) >= 64)
        .select(col("doc_id"), expr("graft_blockhash(pixels, 64)").as("sig"))
      val pairs = Dedup.hammingNearDup(sigs, maxHamming = 7, bands = 8,
        bits = 64).localCheckpoint()
      // expected pairs only for payloads the signature covers (>= 64
      // bytes — shorter ones hash to the 0 sentinel and are filtered)
      val expIdent = d.filter(col("doc_id") % 5 === 0)
        .filter(octet_length(col("text")) >= 64)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + ReencodeOffset).as("doc_b"))
      val expCorr = ascii.filter(col("doc_id") % 7 === 0)
        .filter(octet_length(col("text")) >= 64)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + CorruptOffset).as("doc_b"))
      val nSigs = sigs.agg(count(lit(1)).as("n_media"))
      val g1 = expIdent.join(pairs, Seq("doc_a", "doc_b"), "left")
        .agg(bool_and(coalesce(col("hamming") === 0, lit(false)))
          .as("identical_at_zero"))
      // RATE gate, not bool_and: the <= 7-bit excursion is measured for
      // this corpus (max 6 at both sf) but not a mathematical guarantee —
      // a single unlucky near-flat payload must not flip the whole gate,
      // so >= 90% planted recall is the bar (observed 100%)
      val g2 = expCorr.join(pairs, Seq("doc_a", "doc_b"), "left")
        .agg((avg(when(col("hamming") <= 7, 1.0).otherwise(0.0)) >= 0.9)
          .as("corrupted_found"))
      nSigs.crossJoin(g1).crossJoin(g2)
    })
  )

  /** Id offset for q94's one-byte-corrupted copies. */
  val CorruptOffset = 300000L

  /** Id offset for q79's re-encoded copies (offset % 3 != 0, so the fake
    * container kind/dims change while the payload stays identical). */
  val ReencodeOffset = 100000L

  /** q176: caption = first 12 whitespace tokens; hash batch count (batch
    * SIZE is the scale constant — count grows with the corpus). */
  val CaptionTokens = 12
  val ContrastiveBatches = 64L

  def oracles: Map[String, String] = Map(
    "q176_contrastive_pairs" -> {
      val toks = TextPack.toksSql("text")
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |sides AS (
         |  SELECT doc_id, md5(text) AS payload_hash,
         |         substr(md5(array_to_string(($toks)[1:$CaptionTokens], ' ')), 1, 8)
         |           AS caption_hash,
         |         ${graft.functions.Portable.hash32Sql(
             "'cb:' || CAST(doc_id AS VARCHAR)")} % $ContrastiveBatches AS batch
         |  FROM d)
         |SELECT a.batch AS batch, a.doc_id AS anchor_id, p.doc_id AS partner_id,
         |       a.payload_hash, p.caption_hash,
         |       CAST(CASE WHEN a.doc_id = p.doc_id THEN 1 ELSE 0 END AS BIGINT) AS label
         |FROM sides a JOIN sides p ON a.batch = p.batch
         |ORDER BY batch, anchor_id, partner_id""".stripMargin
    },
    "q26_media_meta" ->
      s"""SELECT doc_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS INT) AS channels,
         |  CAST(16 + doc_id % 48 AS INT) AS width,
         |  CAST(16 + (doc_id * 7) % 32 AS INT) AS height,
         |  octet_length(encode(text)) AS n_payload
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q27_frame_sample" ->
      s"""SELECT doc_id,
         |  CAST(CEIL(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT) AS n_frames,
         |  CAST(LEAST(octet_length(encode(text)), $FrameBytes) AS BIGINT) AS max_frame,
         |  CAST(CASE WHEN octet_length(encode(text)) % $FrameBytes = 0
         |            THEN $FrameBytes ELSE octet_length(encode(text)) % $FrameBytes
         |       END AS BIGINT) AS min_frame
         |FROM documents
         |WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
         |ORDER BY doc_id""".stripMargin,

    "q202_vad_segments" ->
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id % 10 = 0
         |    AND length(text) = octet_length(encode(text))
         |    AND length(text) >= $VadWindow),
         |win AS (SELECT doc_id, text,
         |          unnest(range(0, length(text) // $VadWindow)) AS wi
         |        FROM d),
         |en AS (SELECT doc_id, CAST(wi AS INT) AS wi,
         |         list_sum(list_transform(generate_series(1, $VadWindow),
         |           p -> ascii(substring(text,
         |                  CAST(wi * $VadWindow + p AS INT), 1)))) AS e
         |       FROM win),
         |v AS (SELECT doc_id, wi, e >= $VadThreshold AS f FROM en),
         |r AS (SELECT doc_id, wi,
         |        wi - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi) AS g
         |      FROM v WHERE f),
         |runs AS (SELECT doc_id, g, count(*) AS len FROM r GROUP BY 1, 2),
         |seg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_segments,
         |               CAST(max(len) AS INT) AS longest_run
         |        FROM runs GROUP BY doc_id),
         |tot AS (SELECT doc_id, CAST(count(*) AS INT) AS n_windows,
         |               CAST(sum(CASE WHEN f THEN 1 ELSE 0 END) AS INT)
         |                 AS n_active
         |        FROM v GROUP BY doc_id)
         |SELECT t.doc_id, t.n_windows, t.n_active,
         |       coalesce(s.n_segments, 0) AS n_segments,
         |       coalesce(s.longest_run, 0) AS longest_run
         |FROM tot t LEFT JOIN seg s USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "q28_byte_histogram" ->
      s"""WITH bytes AS (
         |  SELECT doc_id, ascii(substring(text, CAST(pos AS INT), 1)) // 16 AS bin
         |  FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS pos)
         |  WHERE doc_id % 25 = 0 AND length(text) = octet_length(encode(text)))
         |SELECT doc_id, CAST(bin AS INT) AS bin, CAST(COUNT(*) AS BIGINT) AS n
         |FROM bytes GROUP BY doc_id, bin ORDER BY doc_id, bin""".stripMargin,

    "q29_resize" ->
      s"""SELECT doc_id,
         |  CAST(GREATEST(1, (16 + doc_id % 48) // 4) AS INT) AS width,
         |  CAST(GREATEST(1, (16 + (doc_id * 7) % 32) // 4) AS INT) AS height,
         |  CAST(CEIL(octet_length(encode(text)) / 4.0) AS BIGINT) AS n_payload
         |FROM documents ORDER BY doc_id""".stripMargin,

    // md5 of the decoded payload == md5 of the document text's UTF-8 bytes.
    "q79_media_dedup" ->
      s"""WITH frame AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + $ReencodeOffset AS doc_id, text
         |  FROM documents WHERE doc_id % 5 = 0),
         |m AS (SELECT doc_id,
         |        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |             ELSE 'video' END AS kind,
         |        md5(text) AS payload_hash
         |      FROM frame)
         |SELECT payload_hash, min(doc_id) AS keeper,
         |       CAST(count(*) AS BIGINT) AS n_copies,
         |       CAST(count(DISTINCT kind) AS BIGINT) AS n_kinds
         |FROM m GROUP BY payload_hash ORDER BY keeper""".stripMargin,

    // The perceptual signature is engine-specific; the oracle pins the
    // signature-table cardinality and the planted-recall gates.
    "q94_media_neardup" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |a AS (SELECT doc_id, text FROM d
        |      WHERE length(text) = octet_length(encode(text))),
        |frame AS (
        |  SELECT text FROM d
        |  UNION ALL SELECT text FROM d WHERE doc_id % 5 = 0
        |  UNION ALL SELECT substr(text, 1, length(text) - 1) || '!' AS text
        |            FROM a WHERE doc_id % 7 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_media,
        |       TRUE AS identical_at_zero, TRUE AS corrupted_found
        |FROM frame WHERE octet_length(encode(text)) >= 64""".stripMargin
  )
}

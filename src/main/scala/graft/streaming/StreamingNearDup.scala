package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{Portable, TextFunctions => T}

/** Streaming MinHash+LSH near-duplicate detection — the online face of
  * `Dedup.minhashLsh` for continuous crawl ingestion, where each arriving
  * document must be screened against everything already admitted without
  * re-scanning the corpus.
  *
  * Scale design:
  *  - The MinHash signature is computed STATELESSLY per row:
  *    `array_min(transform(shingles, s -> permute(hash(s), i)))` per hash
  *    function. A min over the shingle multiset equals the min over the
  *    distinct set, so this produces bit-identical signatures to the
  *    batch `Dedup.minhashSignatures` groupBy — with zero shuffle and no
  *    state (StreamingNearDupSpec asserts the parity).
  *  - Only the band-bucket grouping is stateful: docs sharing a band key
  *    meet in a `flatMapGroupsWithState` group whose state holds the
  *    (doc_id, signature) pairs seen in that bucket. An arriving doc
  *    emits one candidate per bucket-mate, scored by signature agreement
  *    (the MinHash estimate of Jaccard) — the exact-verify step stays a
  *    downstream batch join, as in the reference pipeline split between
  *    candidate generation and verification.
  *  - State is bounded two ways: a processing-time timeout evicts idle
  *    buckets, and a per-bucket cap stops a degenerate band key (the
  *    stop-shingle pathology) from accumulating unbounded members — the
  *    cap is a documented screening trade, not a silent one (capped
  *    buckets stop emitting, and `bucket_capped` marks their candidates).
  */
object StreamingNearDup {

  case class BandRow(band: Int, bkey: String, doc_id: Long, sig: Array[Long])
  case class Candidate(doc_a: Long, doc_b: Long, est_jaccard: Double,
                       bucket_capped: Boolean)
  case class BucketState(members: List[(Long, Array[Long])], capped: Boolean)

  /** Per-row MinHash signature as an ARRAY<BIGINT> column — stateless twin
    * of `Dedup.minhashSignatures` (same hash family, same values). */
  def signature(text: org.apache.spark.sql.Column, shingleN: Int,
                numHashes: Int): org.apache.spark.sql.Column = {
    val sh = T.wordNgrams(T.tokens(text), shingleN)
    val sigs = (1 to numHashes).map { i =>
      array_min(transform(sh, s => Portable.permute(Portable.hash32m(s), i)))
    }
    array(sigs: _*)
  }

  /** docs stream (doc_id LONG, text STRING) → candidate pairs
    * (doc_a, doc_b, est_jaccard, bucket_capped), ordered numerically:
    * doc_a < doc_b by id, regardless of arrival order (matching the batch
    * lshCandidates' pair convention — keep-first policies must use their
    * own arrival ordering, not this pair order). Documents too short for
    * one shingle produce no bands and pass unscreened (nothing to collide
    * on). */
  def lshCandidates(docs: DataFrame, shingleN: Int = 3, numHashes: Int = 16,
                    bands: Int = 4, maxBucketSize: Int = 64,
                    idleTimeout: Option[String] = Some("1 hour")): Dataset[Candidate] = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val spark = docs.sparkSession
    import spark.implicits._

    val withSig = docs.select(col("doc_id"),
      signature(col("text"), shingleN, numHashes).as("sig"))
      // a doc too short for one shingle has a null signature; without this
      // filter every such doc would share the all-null band key and meet
      // in one degenerate mega-bucket
      .filter(element_at(col("sig"), 1).isNotNull)
    val bandRows = withSig
      .select(col("doc_id"), col("sig"), posexplode(
        array((0 until bands).map { b =>
          concat_ws(":", (0 until r).map(j => element_at(col("sig"), b * r + j + 1)): _*)
        }: _*)).as(Seq("band", "bkey")))
      .as[BandRow]

    // the processing-time timeout keeps the engine scheduling wake-up
    // batches; tests that drive with processAllAvailable() pass None
    // (NoTimeout) — production ingest keeps the default eviction
    val timeoutConf = idleTimeout.map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    bandRows
      .groupByKey(row => (row.band, row.bkey))
      .flatMapGroupsWithState[BucketState, Candidate](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(BucketState(Nil, capped = false))
            val out = scala.collection.mutable.ListBuffer.empty[Candidate]
            rows.foreach { row =>
              if (!s.members.exists(_._1 == row.doc_id)) {
                s.members.foreach { case (prevId, prevSig) =>
                  val matches = prevSig.zip(row.sig).count { case (x, y) => x == y }
                  val (a, b) = if (prevId < row.doc_id) (prevId, row.doc_id)
                               else (row.doc_id, prevId)
                  out += Candidate(a, b, matches.toDouble / prevSig.length, s.capped)
                }
                if (!s.capped) {
                  if (s.members.length < maxBucketSize)
                    s = s.copy(members = (row.doc_id, row.sig) :: s.members)
                  else s = s.copy(capped = true)
                }
              }
            }
            state.update(s)
            idleTimeout.foreach(state.setTimeoutDuration)
            // one candidate per pair per BATCH can still repeat across
            // bands — downstream dedups on (doc_a, doc_b) exactly like the
            // batch lshCandidates' distinct()
            out.distinct.iterator
          }
      }(Encoders.product[BucketState], Encoders.product[Candidate])
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Streaming face of the q215 prefix-block accounting: as documents
  * arrive, each (block_len, prefix-hash) key keeps ONE boolean of state —
  * "has this opening block been seen" — and every doc is emitted tagged
  * hit/miss, the live view of the prefix-cache yield a batch audit
  * measures after the fact.
  *
  * Semantics: the FIRST document to present a block (earliest micro-batch;
  * doc_id ascending within a batch) is the miss that fills the cache,
  * every later one is a hit. Totals per block_len therefore equal the
  * batch accounting (docs − distinct blocks) under ANY micro-batch split —
  * which doc is the miss depends on arrival order, the hit/miss COUNTS do
  * not (StreamingPrefixCacheSpec).
  *
  * Scale: state is one boolean per distinct block — bounded by content
  * diversity, not stream length; production pairs this with the RocksDB
  * state backend (StateBackendSpec pattern) and, for unbounded corpora, an
  * event-time timeout so cold blocks age out like a real cache.
  */
object StreamingPrefixCache {

  case class BlockRow(block_len: Int, h: String, doc_id: Long)
  case class HitRow(block_len: Int, doc_id: Long, hit: Boolean)
  case class Seen(seen: Boolean)

  /** (doc_id, text) stream → one (block_len, prefix-hash, doc_id) row per
    * configured block size the doc is long enough for. Same hashing as
    * the q215 batch audit: md5 over the first B tokens joined by ' '. */
  def blocks(docs: DataFrame, sizes: Seq[Int]): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    sizes.map { b =>
      docs
        .filter(size(toks) >= b)
        .select(lit(b).as("block_len"),
          md5(array_join(slice(toks, lit(1), lit(b)), " ")).as("h"),
          col("doc_id"))
    }.reduce(_ unionAll _)
  }

  /** Tag every block row hit/miss against the keyed seen-state. */
  def hits(spark: SparkSession, blockRows: DataFrame): Dataset[HitRow] = {
    import spark.implicits._
    blockRows.as[BlockRow]
      .groupByKey(r => (r.block_len, r.h))
      .flatMapGroupsWithState[Seen, HitRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((b, _), rows, state: GroupState[Seen]) =>
          val sorted = rows.toArray.sortBy(_.doc_id)
          val seenBefore = state.getOption.exists(_.seen)
          if (sorted.nonEmpty && !seenBefore) state.update(Seen(true))
          sorted.iterator.zipWithIndex.map { case (r, i) =>
            HitRow(b, r.doc_id, seenBefore || i > 0)
          }
      }
  }
}

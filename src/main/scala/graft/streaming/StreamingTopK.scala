package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming heavy hitters with BOUNDED state: the space-saving summary
  * (Metwally et al.) per hash shard — the live face of the batch
  * token-frequency queries (q63 exact top-k, q67 CMS probe). Exact
  * streaming counts need a state entry per distinct term (unbounded on
  * an open vocabulary); space-saving keeps exactly `capacity` entries
  * per shard and still guarantees, for the shard's stream of length N:
  * every term with true frequency > N/capacity is PRESENT, and every
  * tracked term satisfies true ≤ count ≤ true + err (err recorded at
  * adoption time). Those guarantees hold under ANY arrival order, which
  * is what the parity spec asserts — an approximate sketch's contract
  * is its bounds, not a bit-identical state.
  *
  * Sharding by term hash makes the state a keyed map (capacity entries ×
  * shards) that Spark distributes like any keyed state; a term always
  * lands on one shard, so per-shard guarantees apply with shard-local N.
  * Final top-k = merge of the shard summaries (a tiny batch query over
  * the Update-mode frontier — shards × capacity rows).
  */
object StreamingTopK {

  case class TokenRow(shard: Int, term: String)
  case class Entry(term: String, count: Long, err: Long)
  case class Summary(shard: Int, n_seen: Long, entries: Seq[Entry])

  /** tokens: STREAMING frame with a `term` STRING column. */
  def topK(spark: SparkSession, tokens: DataFrame,
           shards: Int, capacity: Int): Dataset[Summary] = {
    import spark.implicits._
    require(shards >= 1 && capacity >= 1)
    tokens
      .select((abs(hash(col("term"))) % shards).cast("int").as("shard"),
        col("term"))
      .as[TokenRow]
      .groupByKey(_.shard)
      .mapGroupsWithState[Summary, Summary](GroupStateTimeout.NoTimeout) {
        case (shard, rows, state: GroupState[Summary]) =>
          val prev = state.getOption.getOrElse(Summary(shard, 0L, Vector.empty))
          var n = prev.n_seen
          val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)](
            prev.entries.map(e => e.term -> (e.count, e.err)): _*)
          rows.foreach { r =>
            n += 1
            m.get(r.term) match {
              case Some((c, e)) => m.update(r.term, (c + 1, e))
              case None if m.size < capacity => m.update(r.term, (1L, 0L))
              case None =>
                // evict the minimum-count entry (ties: first inserted),
                // adopt its count as the newcomer's error bound
                val (vict, (vc, _)) = m.minBy { case (t, (c, _)) => c }
                m.remove(vict)
                m.update(r.term, (vc + 1, vc))
            }
          }
          val next = Summary(shard, n,
            m.toVector.map { case (t, (c, e)) => Entry(t, c, e) })
          state.update(next)
          next
      }
  }
}

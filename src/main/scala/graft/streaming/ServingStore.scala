package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row}

/** The served-model store — Spark's stand-in for Flink queryable state
  * (SURVEY.md §7.3).
  *
  * Reference semantics (als-ms/utils/QueryClientHelper.java:104-139): a
  * client serializes a key, RPCs the TaskManager holding that key's
  * `ValueState`, awaits with a timeout, and maps `UnknownKeyOrNamespace` to
  * `Optional.empty`. The state itself is written by
  * `keyBy(0).asQueryableState(...)` (ALSKafkaConsumer.java:85-92) with
  * latest-value-wins per key.
  *
  * Spark re-design: state is materialized per micro-batch by
  * [[ModelConsumer]] via `foreachBatch` upserts into this store; reads are
  * in-process map lookups (`Option` mirrors `Optional.empty` absent-key
  * semantics). Freshness is bounded by the trigger interval instead of
  * per-record — the documented semantic delta (SURVEY.md §7.3).
  *
  * Scale note: on a real cluster this trait's impl would be an external KV
  * (the upsert already arrives as a compacted per-key delta, tiny relative
  * to the fact data); the in-memory [[TrieMapServingStore]] is the
  * single-process impl, and [[ServingStore.snapshotDF]] exposes the state
  * relationally so serving-side queries can also run as joins.
  */
trait ServingStore[K, V] {
  def get(key: K): Option[V]
  def put(key: K, value: V): Unit
  def size: Int
  def snapshot: Map[K, V]
}

/** Thread-safe in-memory latest-value store. */
final class TrieMapServingStore[K, V] extends ServingStore[K, V] {
  private val m = TrieMap.empty[K, V]
  override def get(key: K): Option[V] = m.get(key)
  override def put(key: K, value: V): Unit = m.update(key, value)
  override def size: Int = m.size
  override def snapshot: Map[K, V] = m.readOnlySnapshot().toMap
}

object ServingStore {

  /** A factor-model store: state key "id-KIND" -> factor vector, exactly the
    * reference's `ValueState<Tuple2<String,String>>` payload but typed. */
  type FactorStore = ServingStore[String, Array[Double]]

  def factorStore(): TrieMapServingStore[String, Array[Double]] =
    new TrieMapServingStore[String, Array[Double]]

  /** Upsert a micro-batch of (key STRING, factors ARRAY<DOUBLE>) rows.
    * The batch is already compacted to one row per key by the consumer, so
    * the collect here moves only |updated keys| rows to the store — never
    * the stream itself. Rows with a null key or null factors (malformed
    * wire records) are skipped: one poison record must not kill the
    * streaming query, and at-least-once replay would re-deliver it. */
  def upsertBatch(store: FactorStore, batch: DataFrame): Unit =
    batch.select("key", "factors").collect().foreach { r: Row =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        store.put(r.getString(0), r.getSeq[Double](1).toArray)
      }
    }

  /** The store's state split into the two relational factor tables —
    * (user_id, uf) and (item_id, itf); non-numeric keys (the MEAN rows)
    * are excluded. The single place that knows the "id-KIND" key format
    * on the read side. */
  def factorFrames(spark: org.apache.spark.sql.SparkSession,
                   store: FactorStore): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val snap = snapshotDF(spark, store)
    def side(kind: String, idCol: String, vecCol: String) =
      snap.filter(col("key").endsWith(s"-$kind"))
        .select(split(col("key"), "-").getItem(0).try_cast("long").as(idCol),
          col("factors").as(vecCol))
        .filter(col(idCol).isNotNull)
    (side("U", "user_id", "uf"), side("I", "item_id", "itf"))
  }

  /** The store's state as a DataFrame — the relational face of the served
    * model, so predict paths can run as joins (SURVEY.md §2.3 J1). */
  def snapshotDF(spark: org.apache.spark.sql.SparkSession,
                 store: FactorStore): DataFrame = {
    import spark.implicits._
    store.snapshot.toSeq.toDF("key", "factors")
  }
}

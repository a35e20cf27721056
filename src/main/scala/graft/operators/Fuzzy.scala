package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Blocked approximate-string matching — entity resolution for the messy
  * identifiers a crawl corpus carries (near-identical titles, vendor
  * names, product labels). The reference resolves entities only by exact
  * integer id (ALSKafkaConsumer.java:78-82 keys state on `id-KIND`); a
  * curation engine also needs the fuzzy variant.
  *
  * Scale shape: never all-pairs. Candidates are generated ONLY within a
  * caller-chosen blocking key (here: a token of the name), so the join is
  * an equi-join on the block with cost Σ |block|² — bounded by the
  * largest block, not the corpus. Edit distance runs on candidates only.
  * At 100 TB the blocking key is the lever (coarser = more recall, bigger
  * blocks); a skewed block is handled like any skewed equi-join key
  * (salt, AQE). Recall is bounded by the blocking rule by design — pairs
  * in different blocks are never compared (classic blocking tradeoff;
  * the rule itself is part of the operator's contract so the oracle
  * replays it exactly).
  */
object Fuzzy {

  /** Within-block pairs of distinct `nameCol` values at Levenshtein
    * distance ≤ `maxDist`. `blockExpr` maps a name to its blocking key.
    * Emits (block, name_a, name_b, dist) with name_a < name_b. */
  def blockedLevenshtein(df: DataFrame, nameCol: String,
                         blockExpr: org.apache.spark.sql.Column,
                         maxDist: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).distinct()
      .select(col("name"), blockExpr.as("block"))
    val l = names.select(col("block"), col("name").as("name_a"))
    val r = names.select(col("block"), col("name").as("name_b"))
    l.join(r, "block")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}

/** Driver-contract queries for [[Fuzzy]]. */
object FuzzyPack extends QueryPack {

  val MaxDist = 3

  /** q224 planted-duplicate id offset, blocking prefix, re-key modulus. */
  val GoldenOffset = 200000L
  val GoldenBlockLen = 16
  val GoldenMod = 6

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Entity-resolution GOLDEN RECORD capstone — the full master-data
    // pipeline in one declarative plan: plant re-keyed customer records
    // with a one-char name typo and a dropped segment field, then
    // (1) block on a name prefix (cost Σ|block|², never all-pairs),
    // (2) edge = Levenshtein ≤ 1 AND equal balance cents (multi-field
    // match, so sibling customers at name-distance 1 do NOT merge),
    // (3) transitive closure via the q57 min-label components, and
    // (4) survivorship: shortest name wins (originals beat the doubled-
    // char typos), first non-null segment, max balance — the merged
    // record downstream systems consume. Every stage is relational:
    // block equi-join, O(diameter) label rounds, one grouped aggregate.
    "q224_golden_record" -> ((s, dir) => {
      val c = Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          round(col("c_acctbal") * 100, 0).cast("long").as("cents"),
          col("c_mktsegment").as("segment"))
      val copies = c.filter(col("id") % GoldenMod === 0)
        .select((col("id") + GoldenOffset).as("id"),
          concat(col("name"), substring(col("name"), -1, 1)).as("name"),
          col("cents"), lit(null).cast("string").as("segment"))
      val frame = c.unionAll(copies).localCheckpoint()
      val blocked = frame
        .withColumn("block", substring(col("name"), 1, GoldenBlockLen))
      val edges = blocked
        .select(col("block"), col("id").as("id_a"),
          col("name").as("name_a"), col("cents").as("cents_a"))
        .join(blocked.select(col("block"), col("id").as("id_b"),
          col("name").as("name_b"), col("cents").as("cents_b")), "block")
        .filter(col("id_a") < col("id_b") &&
          col("cents_a") === col("cents_b") &&
          levenshtein(col("name_a"), col("name_b")) <= 1)
        .select(col("id_a"), col("id_b"))
      val comp = DupGroups.connectedComponents(edges, "id_a", "id_b")
        .select(col("id"), col("comp").as("component"))
      frame.join(comp, "id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          min(struct(length(col("name")).as("l"), col("name").as("n")))
            .getField("n").as("golden_name"),
          max(col("cents")).as("acctbal_cents"),
          max(col("segment")).as("segment"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .orderBy("component")
    }),

    // Entity resolution over part names: block on the last name token
    // (the product noun), pair within blocks, keep pairs within edit
    // distance 3. The blocking key is part of the operator contract, so
    // the oracle replays the identical rule.
    "q127_fuzzy_join" -> ((s, dir) => {
      val parts = Tables.table(s, dir, "part")
      Fuzzy.blockedLevenshtein(parts, "p_name",
          element_at(split(col("name"), " "), -1), MaxDist)
        .select(col("block"), col("name_a"), col("name_b"),
          col("dist").cast("long").as("dist"))
        .orderBy("block", "name_a", "name_b")
    }),
  )

  def oracles: Map[String, String] = Map(

    "q224_golden_record" ->
      s"""WITH RECURSIVE c AS (
         |  SELECT c_custkey AS id, c_name AS name,
         |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         |         c_mktsegment AS segment
         |  FROM customer
         |  UNION ALL
         |  SELECT c_custkey + $GoldenOffset,
         |         c_name || substr(c_name, length(c_name), 1),
         |         CAST(round(c_acctbal * 100) AS BIGINT), NULL
         |  FROM customer WHERE c_custkey % $GoldenMod = 0),
         |blk AS (SELECT *, substr(name, 1, $GoldenBlockLen) AS block FROM c),
         |edges AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM blk a JOIN blk b ON a.block = b.block AND a.id < b.id
         |  WHERE a.cents = b.cents AND levenshtein(a.name, b.name) <= 1),
         |und AS (SELECT id_a AS src, id_b AS dst FROM edges
         |        UNION SELECT id_b, id_a FROM edges),
         |verts AS (SELECT DISTINCT src AS id FROM und),
         |walk(id, comp) AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT u.src AS id, w.comp FROM und u JOIN walk w ON u.dst = w.id),
         |lab AS (SELECT id, min(comp) AS component FROM walk GROUP BY id)
         |SELECT component, CAST(count(*) AS BIGINT) AS n_members,
         |       (list(name ORDER BY length(name), name))[1] AS golden_name,
         |       max(cents) AS acctbal_cents,
         |       max(segment) AS segment,
         |       min(c.id) AS min_id, max(c.id) AS max_id
         |FROM c JOIN lab ON lab.id = c.id
         |GROUP BY component ORDER BY component""".stripMargin,

    "q127_fuzzy_join" ->
      s"""WITH names AS (
         |  SELECT DISTINCT p_name AS name FROM part),
         |blocked AS (
         |  SELECT name, string_split(name, ' ')[-1] AS block FROM names)
         |SELECT a.block, a.name AS name_a, b.name AS name_b,
         |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
         |FROM blocked a JOIN blocked b
         |  ON a.block = b.block AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) <= $MaxDist
         |ORDER BY a.block, name_a, name_b""".stripMargin,
  )
}

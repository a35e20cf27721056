package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-contract queries with their DuckDB oracles.
  * SparkEntry concatenates all packs; each operator family keeps its
  * query bodies next to the operator implementation. */
trait QueryPack {
  /** name -> (session, sfDir) -> result */
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** name -> DuckDB ANSI SQL over the same tables (subset of queries' keys;
    * omitted keys get the driver's weaker rows-only check). */
  def oracles: Map[String, String]
}

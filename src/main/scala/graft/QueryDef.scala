package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query over the same parquet tables. Queries without an oracle get
  * the driver's weaker rows-only check.
  *
  * Conventions that make the oracle hash-compare exact:
  *  - every computed column is aliased identically in both engines;
  *  - double aggregates are routed through decimal (order-independent)
  *    or derived from exact decimal/long inputs with a single final
  *    double op;
  *  - output includes a deterministic ORDER BY with a unique tiebreak.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

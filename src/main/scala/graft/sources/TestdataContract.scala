package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Pre-flight schema contract for the driver-generated testdata.
  *
  * Round 7 lesson: the landing zone regenerated under the engine with
  * a different timestamp encoding and 17 queries faceplanted with 17
  * opaque analysis errors. The registry should instead fail ONCE,
  * loudly, naming the exact column whose storage drifted — so
  * [[graft.Verify]] and [[graft.Bench]] call [[assertContract]] before
  * running a single query.
  *
  * Timestamp columns are writer-dependent by contract: both
  * TIMESTAMP(MICROS) (instant) and TIMESTAMP_NTZ encodings are
  * accepted (the readers normalize — [[Tables.normalizeEventTs]]);
  * `events.ts` additionally accepts the legacy INT64-nanos-as-long
  * read. Everything else is pinned exactly.
  */
object TestdataContract {

  /** Column contract: name → acceptable Spark read types, in table
    * order. Order matters (positional SQL like `GROUP BY 1` and the
    * driver's schema compare both see it). */
  private val ts: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val tsOrLegacyLong: Set[DataType] = ts + LongType

  val expected: Seq[(String, Seq[(String, Set[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set(IntegerType), "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Set(IntegerType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType), "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType), "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType), "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> ts, "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> ts),
    "events" -> Seq(
      "event_id" -> Set(LongType), "ts" -> tsOrLegacyLong,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Set(IntegerType)),
  )

  /** Diff one scale-factor directory against the contract. Empty =
    * conformant. Each entry is a one-line human-actionable diff. */
  def diff(spark: SparkSession, sfDir: String): Seq[String] = {
    // events needs the legacy conf to even read a nanos footer
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expected.flatMap { case (tbl, cols) =>
      val path = s"$sfDir/$tbl.parquet"
      val got =
        try Right(spark.read.parquet(path).schema)
        catch { case e: Throwable =>
          Left(s"$tbl: unreadable at $path: ${e.getMessage.linesIterator.next()}") }
      got match {
        case Left(err) => Seq(err)
        case Right(schema) =>
          val gotCols = schema.fields.map(f => f.name -> f.dataType).toSeq
          if (gotCols.map(_._1) != cols.map(_._1))
            Seq(s"$tbl: columns ${gotCols.map(_._1).mkString(",")} != " +
              s"expected ${cols.map(_._1).mkString(",")}")
          else cols.zip(gotCols).collect {
            case ((name, accept), (_, actual)) if !accept(actual) =>
              s"$tbl.$name: stored as ${actual.simpleString}, contract allows " +
                accept.map(_.simpleString).mkString("{", "|", "}")
          }
      }
    }
  }

  /** Fail loud before the registry runs: one exception naming every
    * drifted column, instead of N opaque per-query analysis errors. */
  def assertContract(spark: SparkSession, sfDir: String): Unit = {
    val d = diff(spark, sfDir)
    if (d.nonEmpty) throw new IllegalStateException(
      s"testdata contract violation at $sfDir:\n  " + d.mkString("\n  "))
  }
}

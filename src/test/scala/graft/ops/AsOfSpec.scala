package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  def t(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  lazy val left = Seq(
    (1L, t(10), "e1"),
    (1L, t(30), "e2"),
    (2L, t(10), "e3"),   // key 2 has no prior right row at t10
    (3L, t(10), "e4"))   // key 3 has no right rows at all
    .toDF("k", "ts", "ev")

  lazy val right = Seq(
    (1L, t(5), "p1", 100.0),
    (1L, t(10), "p2", 200.0),  // exactly at e1's time -> visible (>=)
    (1L, t(25), "p3", 300.0),
    (2L, t(50), "p4", 400.0))  // after e3 -> not visible
    .toDF("k", "ts", "pid", "pval")

  test("asOfJoin picks the latest right row at or before each left time") {
    val got = AsOf.asOfJoin(left, right, Seq("k"), "ts", "ts",
      Seq("pid", "pval"), tiebreak = Some("pid"))
      .select("ev", "asof_pid", "asof_pval")
      .collect().map(r => (r.getString(0), r.getString(1), r.get(2))).toSet
    assert(got === Set(
      ("e1", "p2", 200.0),  // tie at t10 included
      ("e2", "p3", 300.0),  // latest prior
      ("e3", null, null),   // right row is in the future
      ("e4", null, null)))  // no right rows for key
  }

  test("asOfJoinForward picks the earliest right row at or after each left time") {
    val got = AsOf.asOfJoinForward(left, right, Seq("k"), "ts", "ts",
      Seq("pid", "pval"), tiebreak = Some("pid"))
      .select("ev", "asof_pid", "asof_pval")
      .collect().map(r => (r.getString(0), r.getString(1), r.get(2))).toSet
    assert(got === Set(
      ("e1", "p2", 200.0),  // tie at t10 visible (>=)
      ("e2", null, null),   // no purchase after t30 for key 1
      ("e3", "p4", 400.0),  // next purchase is in the future -> visible
      ("e4", null, null)))  // no right rows for key
  }

  test("asOfJoinForward == brute-force nested-loop on random data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(60)(i =>
      (rnd.nextInt(4).toLong, t(rnd.nextInt(59)), s"e$i")).toDF("k", "ts", "ev")
    val r = Seq.tabulate(40)(i =>
      (rnd.nextInt(4).toLong, t(rnd.nextInt(59)), s"p$i", i.toDouble))
      .toDF("k", "ts", "pid", "pval")
    val got = AsOf.asOfJoinForward(l, r, Seq("k"), "ts", "ts",
        Seq("pid", "pval"), tiebreak = Some("pid"))
      .select("ev", "asof_pid")
      .collect().map(x => (x.getString(0), x.getString(1))).toMap
    val rightRows = r.collect()
      .map(x => (x.getLong(0), x.getTimestamp(1), x.getString(2)))
    val want = l.collect().map { x =>
      val (k, ts, ev) = (x.getLong(0), x.getTimestamp(1), x.getString(2))
      val cands = rightRows.filter(p => p._1 == k && !p._2.before(ts))
      val best = if (cands.isEmpty) null
        else cands.minBy(p => (p._2.getTime, p._3))._3
      ev -> best
    }.toMap
    assert(got === want)
  }

  test("asOfJoin keeps every left row exactly once (left-outer semantics)") {
    val out = AsOf.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("pid", "pval"))
    assert(out.count() === left.count())
    assert(out.columns.toSeq ===
      Seq("k", "ts", "ev", "asof_pid", "asof_pval"))
  }

  test("payload fields all come from the SAME matched right row, even when " +
    "that row has null payload fields") {
    // The matched row (latest prior / earliest next) carries a NULL in
    // one payload column. Independent per-column ignore-nulls windows
    // would fill that column from a DIFFERENT right row; the struct
    // formulation must keep the null.
    val l = Seq((1L, t(30), "e1")).toDF("k", "ts", "ev")
    val r = Seq(
      (1L, t(10), "p_old", Some(100.0)),
      (1L, t(20), null.asInstanceOf[String], Some(200.0)),  // backward match: pid null
      (1L, t(40), "p_next", None: Option[Double]),          // forward match: pval null
      (1L, t(50), "p_later", Some(400.0)))
      .toDF("k", "ts", "pid", "pval")
    val back = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts", Seq("pid", "pval"))
      .select("asof_pid", "asof_pval").collect()(0)
    assert(back.isNullAt(0), "backward: null pid must NOT be patched from an older row")
    assert(back.getDouble(1) === 200.0)
    val fwd = AsOf.asOfJoinForward(l, r, Seq("k"), "ts", "ts", Seq("pid", "pval"))
      .select("asof_pid", "asof_pval").collect()(0)
    assert(fwd.getString(0) === "p_next")
    assert(fwd.isNullAt(1), "forward: null pval must NOT be patched from a later row")
  }

  test("numeric tiebreaks compare numerically, not lexicographically") {
    // Two right rows at the SAME timestamp with Long ids 9 and 10:
    // a string-ordered tiebreak would pick 9 ('9' > '10'); the
    // documented greatest-tiebreak-wins must pick 10.
    val l = Seq((1L, t(20), "e1")).toDF("k", "ts", "ev")
    val r = Seq(
      (1L, t(10), 9L, 1.0),
      (1L, t(10), 10L, 2.0))
      .toDF("k", "ts", "pid", "pval")
    val got = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts",
      Seq("pid", "pval"), tiebreak = Some("pid"))
      .select("asof_pid", "asof_pval").collect()(0)
    assert(got.getLong(0) === 10L)
    assert(got.getDouble(1) === 2.0)
  }
}

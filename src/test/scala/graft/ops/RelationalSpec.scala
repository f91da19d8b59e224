package graft.ops

import graft.SparkSpec
import graft.ops.Relational._
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct is within 5% of exact at sf0.001") {
    val li = graft.sources.Tables.lineitem(spark, sf0001)
    val r = li.agg(
      approx_count_distinct($"l_partkey", 0.01).as("approx"),
      countDistinct($"l_partkey").as("exact")).collect()(0)
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"$approx vs $exact")
  }

  test("clampPositive maps zero and negatives to the floor (P4)") {
    val got = Seq(5.0, 0.0, -1.0, 0.1).toDF("x")
      .select(clampPositive($"x", 0.1).as("y"))
      .as[Double].collect().toSeq
    assert(got === Seq(5.0, 0.1, 0.1, 0.1))
  }

  test("meanFillAgg fills nulls with the column mean, leaves non-nulls (P5)") {
    val df = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val got = meanFillAgg(df, Seq("v")).as[Double].collect().toSeq
    assert(got.sorted === Seq(1.0, 2.0, 2.0, 3.0))
  }

  test("meanFillAgg imputed column has no nulls, non-null values unchanged") {
    val df = Seq(Some(2.0), Some(4.0), None, Some(9.0), None, None).toDF("v")
    val filled = meanFillAgg(df, Seq("v"))
    assert(filled.filter($"v".isNull).count() === 0)
    assert(filled.filter($"v" === 5.0).count() === 3) // mean of 2,4,9
  }

  test("ruleOverride truth table (P6): forces 0 only when all three conjuncts hold") {
    val rows = Seq(
      (25000, 250000, 90000, 1.0, 0.0),  // all hold -> overridden
      (35000, 250000, 90000, 1.0, 1.0),  // income fails
      (25000, 150000, 90000, 1.0, 1.0),  // loan fails
      (25000, 250000, 150000, 1.0, 1.0)) // property fails
    val df = rows.map(r => (r._1, r._2, r._3, r._4)).toDF(
      "income", "loan_amount", "property_value", "pred")
    val got = df.select(ruleOverride($"pred", $"income", $"loan_amount",
      $"property_value").as("out")).as[Double].collect().toSeq
    assert(got === rows.map(_._5))
  }

  test("decisionLabel maps 1->sanctioned, 0->rejected (P7)") {
    val got = Seq(1.0, 0.0).toDF("p")
      .select(decisionLabel($"p")).as[String].collect().toSeq
    assert(got === Seq("sanctioned", "rejected"))
  }

  test("exactSampleByHash returns exactly n rows, deterministically (L5)") {
    val df = spark.range(1000).toDF("id")
    val a = exactSampleByHash(df, $"id", 50).as[Long].collect().toSeq
    val b = exactSampleByHash(df, $"id", 50).as[Long].collect().toSeq
    assert(a.size === 50)
    assert(a === b)
  }

  test("seededSplit is disjoint, exhaustive, reproducible (L3/L4)") {
    val df = spark.range(1000).toDF("id")
    val Array(tr1, te1) = seededSplit(df, Array(0.8, 0.2), 42L)
    val Array(tr2, te2) = seededSplit(df, Array(0.8, 0.2), 42L)
    assert(tr1.count() + te1.count() === 1000)
    assert(tr1.intersect(te1).count() === 0)
    assert(tr1.count() === tr2.count())
    assert(tr1.except(tr2).count() === 0)
  }

  test("exactFractionSplit yields exact counts") {
    val df = spark.range(999).toDF("id")
    val (tr, te) = exactFractionSplit(df, 0.2, $"id")
    assert(te.count() === 200)  // round(999*0.2)
    assert(tr.count() === 799)
    assert(tr.intersect(te).count() === 0)
  }

  test("argmax returns the 0-based index of the max (P8)") {
    val got = Seq(Seq(0.1, 0.9), Seq(0.8, 0.2), Seq(1.0, 1.0))
      .toDF("scores").select(argmax($"scores")).as[Int].collect().toSeq
    assert(got === Seq(1, 0, 0)) // ties -> first occurrence, torch.argmax parity
  }

  test("saltedJoin equals the plain join on a skewed key") {
    val left = spark.range(10000).toDF("id")
      .withColumn("k", when($"id" < 9000, 1L).otherwise($"id")) // 90% on key 1
      .withColumn("v", $"id" * 2)
    val right = Seq((1L, "hot"), (9500L, "cold"), (42L, "unmatched-on-left"))
      .toDF("k", "label")
    val plain = left.join(right, "k").agg(count(lit(1)), sum($"v")).collect()(0)
    val salted = saltedJoin(left, right, "k", nSalts = 8)
      .agg(count(lit(1)), sum($"v")).collect()(0)
    assert(plain === salted)
  }

  test("decSum/decAvg are partitioning-invariant") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val one = vals.toDF("v").repartition(1).agg(decSum($"v")).collect()(0).get(0)
    val many = vals.toDF("v").repartition(7).agg(decSum($"v")).collect()(0).get(0)
    assert(one === many)
  }

  test("roundRobinShards: every item assigned once, shard count = ceil(total/budget)") {
    val df = (1L to 100L).map(i => (i, 10L + i % 7)).toDF("id", "sz")
    val total = (1L to 100L).map(i => 10L + i % 7).sum
    val out = roundRobinShards(df, "id", "sz", budget = 100L).collect()
    assert(out.length === 100)
    assert(out.map(_.getLong(0)).toSet === (1L to 100L).toSet)
    val expectShards = (total + 99) / 100
    assert(out.map(_.getLong(1)).distinct.length === expectShards)
  }

  test("linearInterpolate: interior gaps filled proportionally, edges stay null") {
    val df = Seq(
      (1L, 0L, Some(10.0)),
      (1L, 10L, None),          // 1/4 of the way 10 -> 30: expect 15
      (1L, 40L, Some(30.0)),
      (1L, 50L, None),          // trailing: no next -> null
      (2L, 0L, None),           // leading: no prev -> null
      (2L, 10L, Some(5.0)))
      .map { case (k, t, v) =>
        (k, t, v.map(java.lang.Double.valueOf).orNull) }
      .toDF("k", "t", "v")
    val got = linearInterpolate(df, "v", "t", Seq("k"))
      .orderBy($"k", $"t")
      .collect().map(r => if (r.isNullAt(2)) null else r.getDouble(2))
    assert(got.toSeq === Seq(10.0, 15.0, 30.0, null, null, 5.0))
  }

  test("weightedSample: deterministic, k rows, biased toward heavy weights") {
    val df = (1L to 500L).map(i => (i, if (i <= 50) 100L else 1L))
      .toDF("id", "w")
    val s1 = weightedSample(df, "id", "w", 50).select("id")
      .as[Long].collect().toSet
    val s2 = weightedSample(df.repartition(7), "id", "w", 50).select("id")
      .as[Long].collect().toSet
    assert(s1.size === 50)
    assert(s1 === s2) // same sample under any partitioning
    // the 50 heavy rows (100x weight) should dominate the sample
    assert(s1.count(_ <= 50) >= 35, s"heavy rows in sample: ${s1.count(_ <= 50)}")
    // different seed, different sample
    val s3 = weightedSample(df, "id", "w", 50, seed = 7L).select("id")
      .as[Long].collect().toSet
    assert(s1 !== s3)
  }

  test("globalRankAndRunningSum == single-window rank/cumsum, any order shape") {
    val df = Seq(("c", 5L), ("a", 3L), ("b", 3L), ("d", 1L), ("e", 8L))
      .toDF("k", "v")
    val (got, total) = Relational.globalRankAndRunningSum(
      df, Seq($"v".desc, $"k"), $"v", "rnk", "cum")
    assert(total === 20L)
    val rows = got.select($"k", $"rnk", $"cum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // order: e(8) c(5) a(3) b(3) d(1)
    assert(rows === Set(
      ("e", 1L, 8L), ("c", 2L, 13L), ("a", 3L, 16L), ("b", 4L, 19L),
      ("d", 5L, 20L)))
  }

  test("packSequences: boundary-straddling docs report correct seq spans") {
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 2L)).toDF("doc_id", "n")
    val got = Relational.packSequences(docs, Seq($"doc_id"), $"n",
        seqTokens = 4L)
      .select($"doc_id", $"start_seq", $"start_offset", $"end_seq")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // cum: 3, 7, 9 → doc1 [0,0..]; doc2 starts seq0@3, spans into seq1;
    // doc3 starts seq1@3, ends seq2
    assert(got === Set((1L, 0L, 0L, 0L), (2L, 0L, 3L, 1L), (3L, 1L, 3L, 2L)))
  }

  test("roundRobinShards: distributed rank path — no unpartitioned window, " +
      "byte-identical to the single-window formulation") {
    val df = ((1L to 5L).map(i => (i, 500L)) ++
      (6L to 105L).map(i => (i, 7L))).toDF("id", "sz").repartition(7)
    val out = roundRobinShards(df, "id", "sz", budget = 400L)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assertNoUnpartitionedWindow(out)
    // single-window twin (the pre-distributed formulation)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"sz".desc, $"id")
    val total = (5 * 500L) + (100 * 7L)
    val nShards = (total + 399L) / 400L
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
      .select($"id", (($"rn" - 1) % nShards).as("shard"), $"sz")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("balanceClasses: single pass equals the per-class-loop reference, " +
      "exact minority-count classes, null labels are a class") {
    val df = (
      (1L to 100L).map(i => (i, Some("big"))) ++
      (101L to 130L).map(i => (i, Some("mid"))) ++
      (131L to 140L).map(i => (i, Some("small"))) ++
      (141L to 155L).map(i => (i, None: Option[String]))
    ).toDF("id", "label")
    val got = balanceClasses(df, "label", "id")
    val byClass = got.collect()
      .groupBy(r => if (r.isNullAt(1)) null else r.getString(1))
      .view.mapValues(_.map(_.getLong(0)).toSet).toMap
    // minority class has 10 rows -> EVERY class trimmed to exactly 10
    assert(byClass.keySet === Set("big", "mid", "small", null))
    byClass.values.foreach(ids => assert(ids.size === 10))
    // reference formulation: one scan per class, rank by the same md5
    // order, keep the prefix (the pre-rewrite implementation)
    val wanted = Seq(Some("big"), Some("mid"), Some("small"),
      None: Option[String]).map { lbl =>
      val cls = df.filter($"label" <=> lit(lbl.orNull))
      val (ranked, _) = globalRankAndRunningSum(cls,
        Seq(md5(concat_ws("|", $"id", lit(42L)))), lit(1L), "__rn", "__cum")
      ranked.filter($"__rn" <= 10).select("id")
        .as[Long].collect().toSet -> lbl.orNull
    }.map(_.swap).toMap
    byClass.foreach { case (lbl, ids) =>
      assert(ids === wanted(lbl), s"class $lbl differs from reference")
    }
    // deterministic across calls
    assert(balanceClasses(df, "label", "id").collect().map(_.toString).sorted
      .toSeq === got.collect().map(_.toString).sorted.toSeq)
  }

  test("groupAwareSplit: groups are atomic (no group straddles the split), " +
      "deterministic, fraction roughly honored by group mass") {
    // 200 groups of 5 rows each; a uniform ROW split would place ~99.9%
    // of groups on both sides — group-aware places each wholly
    val df = (0L until 1000L).map(i => (i, s"g${i % 200}")).toDF("id", "g")
    val got = groupAwareSplit(df, col("g"), 0.3)
    val sides = got.groupBy("g")
      .agg(countDistinct(col("is_test")).as("n_sides"))
      .agg(max(col("n_sides"))).as[Long].head()
    assert(sides === 1L, "a group straddled the split")
    val frac = got.filter(col("is_test")).count().toDouble / 1000
    assert(frac > 0.15 && frac < 0.45, s"test fraction $frac")
    // deterministic + seed-sensitive
    assert(groupAwareSplit(df, col("g"), 0.3).collect().map(_.toString).toSeq
      === got.collect().map(_.toString).toSeq)
    val other = groupAwareSplit(df, col("g"), 0.3, seed = 7L)
    assert(other.filter(col("is_test")).select("g").distinct().collect().toSet
      !== got.filter(col("is_test")).select("g").distinct().collect().toSet)
    // duplicated CONTENT as the group: exact copies can't leak across
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("id", "text")
    val split = groupAwareSplit(docs, md5(col("text")), 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(split(1L) === split(2L), "exact duplicates split apart")
  }

  test("roundRobinShards: LPT round-robin balances shard loads") {
    // skewed sizes: a few huge docs + many small ones
    val df = ((1L to 5L).map(i => (i, 500L)) ++
      (6L to 105L).map(i => (i, 7L))).toDF("id", "sz")
    val loads = roundRobinShards(df, "id", "sz", budget = 400L)
      .groupBy("shard").agg(sum($"sz").as("load"))
      .collect().map(_.getLong(1))
    // perfect balance = total/n; LPT round-robin stays well inside 2×
    val ideal = loads.sum.toDouble / loads.length
    assert(loads.max <= ideal * 2,
      s"max load ${loads.max} vs ideal $ideal")
  }

  test("exactQuantiles: rank selection matches a driver-side reference " +
      "on a hand-checkable frame") {
    // group g: values 10..100 step 10 (n=10); p=0.5 → rank 5 → 50,
    // p=0.9 → rank 9 → 90, p=0.25 → rank ceil(2.5)=3 → 30
    val df = (1L to 10L).map(i => ("g", i, i * 10.0)).toDF("grp", "id", "v")
    val got = exactQuantiles(df, Seq("grp"), "v", Seq("id"),
        Seq(0.25, 0.5, 0.9))
      .orderBy($"p").select($"p", $"quantile", $"n_rows")
      .as[(Double, Double, Long)].collect().toSeq
    assert(got === Seq((0.25, 30.0, 10L), (0.5, 50.0, 10L), (0.9, 90.0, 10L)))
  }

  test("exactQuantiles: ties broken by tie column — the selected ROW is " +
      "deterministic, not just the value") {
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 5.0),
      ("g", 4L, 9.0)).toDF("grp", "id", "v")
    // p=0.5 → rank 2: the id=2 row under (v, id) order
    val got = exactQuantiles(df, Seq("grp"), "v", Seq("id"), Seq(0.5))
      .select($"quantile").as[Double].head()
    assert(got === 5.0)
  }

  test("exactQuantilesGlobal equals the grouped form collapsed to one " +
      "group, and runs without an unpartitioned window") {
    val df = (1L to 1000L).map(i => (i, (i * 37 % 1000).toDouble))
      .toDF("id", "v")
    val ps = Seq(0.25, 0.5, 0.75, 0.99)
    val global = exactQuantilesGlobal(df, "v", Seq("id"), ps)
      .orderBy($"p").select($"p", $"quantile", $"n_rows")
      .as[(Double, Double, Long)].collect().toSeq
    val grouped = exactQuantiles(df.withColumn("g", lit(1)),
        Seq("g"), "v", Seq("id"), ps)
      .orderBy($"p").select($"p", $"quantile", $"n_rows")
      .as[(Double, Double, Long)].collect().toSeq
    assert(global === grouped)
    val plan = exactQuantilesGlobal(df, "v", Seq("id"), ps)
    plan.collect()
    assertNoUnpartitionedWindow(plan)
  }

  test("groupedOls: exact fit on a known line, noise-free and noisy") {
    // group a: y = 3x + 7 exactly → slope 3, intercept 7
    // group b: x constant → zero variance → NULL slope/intercept
    val rows = (1L to 5L).map(x => ("a", x, 3 * x + 7)) ++
      Seq(("b", 2L, 10L), ("b", 2L, 20L))
    val got = groupedOls(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got("a") === ((5L, Some(3.0), Some(7.0))))
    assert(got("b") === ((2L, None, None)))
    // hand-computed non-integer fit: points (1,1),(2,2),(3,5)
    // n=3 Σx=6 Σy=8 Σxy=20 Σxx=14 → slope=(60-48)/(42-36)=2
    // intercept=(8-2·6)/3=-4/3
    val g2 = groupedOls(Seq(("c", 1L, 1L), ("c", 2L, 2L), ("c", 3L, 5L))
        .toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect()(0)
    assert(g2.getDouble(2) === 2.0)
    assert(g2.getDouble(3) === (8.0 - 2.0 * 6.0) / 3.0)
  }

  test("groupedOls: NULL x/y rows are excluded so n matches the summed " +
      "moments; an all-null group is absent") {
    // group a: nulls interleaved with the exact line y = 2x — a count
    // that included the null rows would skew slope/intercept silently
    // (sum() skips nulls but count(1) wouldn't); group b carries no
    // fit evidence at all and must be ABSENT, not a guard trip
    val rows = Seq(
      ("a", Some(1L), Some(2L)), ("a", Some(2L), Some(4L)),
      ("a", Some(3L), Some(6L)),
      ("a", None: Option[Long], Some(99L)), ("a", Some(4L), None: Option[Long]),
      ("b", None: Option[Long], None: Option[Long]))
    val got = groupedOls(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect()
    assert(got.length === 1)
    assert(got(0).getString(0) === "a")
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getDouble(2) === 2.0)
    assert(got(0).getDouble(3) === 0.0)
  }

  test("groupedOls: DECIMAL(38,0) envelope breach raises, not nulls") {
    // two near-long-max products overflow the combined n·Σxy moment
    val big = 3000000000000000000L // 3e18; Σxy ≈ 1.8e37, n·Σxy ≈ 3.6e37 ok
    // push past 1e38: four rows → Σxy ≈ 3.6e37, n·Σxy ≈ 1.45e38 > 1e38
    val rows = (1 to 4).map(_ => ("g", big, big))
    val ex = intercept[Exception] {
      groupedOls(rows.toDF("g", "x", "y"), Seq("g"), "x", "y").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("groupedOls")),
      s"expected the loud envelope guard, got: ${ex.getMessage}")
  }
}

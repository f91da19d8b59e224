package graft.queries

import graft.QueryDef
import graft.ops.SeededKMeans
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 block: the ANN index family under the DETERMINISTIC
  * md5-seeded KMeans ([[graft.ops.SeededKMeans]]) — hash-oracled twins
  * of the MLlib-seeded rows-only queries (q47/q130/q158).
  *
  * Round 8 left exactly one family of queries unverifiable by
  * construction: everything downstream of an MLlib KMeans fit, whose
  * kmeans|| init and float partial sums no external engine can replay.
  * This block does for that family what q154 did for BPE: the fit
  * becomes a pure corpus function (micro-grid quantization, md5-rank
  * init, integer Lloyd steps — see [[SeededKMeans]]'s contract), the
  * DuckDB oracle replays the ENTIRE training loop in a recursive CTE,
  * and the index queries built on it hash-compare end to end:
  *
  *  - q173: the fit itself — final centroids + cell sizes (q154's
  *    merge-table shape).
  *  - q174: single-query IVF top-k (q47's shape).
  *  - q175: build + query the STORED cell-partitioned IVF index
  *    (q130's shape).
  *  - q176: batch k-NN under PQ/ADC compression (q158's shape), exact
  *    integer distances end to end.
  *
  * Oracle SQL notes: the recursive CTE carries the centroid table as
  * one LIST<STRUCT{cell, c}> per recursion row (the q154 vocab
  * pattern); correlated argmin subqueries must (a) qualify outer CTE
  * columns (`fcN.cents` — DuckDB's binder loses bare names through a
  * derived table) and (b) keep an outer-column-dependent bound in
  * `generate_series` (`len(x)`, never a literal — a constant series
  * gets folded before correlation resolves). Both learned empirically;
  * tests pin them.
  */
object SeededAnnQueries {

  private val K = 8          // nlist for the IVF family
  private val Iters = 5      // Lloyd iterations (full fit, q173-175)
  private val Seed = 42L
  private val PqM = 4        // PQ subspaces
  private val PqKsub = 8     // centers per subspace
  private val PqIters = 4    // Lloyd iterations per subspace fit

  /** Shared base CTE: double vectors + micro-grid quantization
    * (`floor(x·10^6 + 0.5)` — [[SeededKMeans.quantize]] verbatim). */
  private val QvCte =
    """qv AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS dv,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS q
      |  FROM embeddings
      |)""".stripMargin

  /** One recursive-CTE Lloyd loop over `vecExpr` (a BIGINT[] expression
    * on qv): md5-rank init, integer argmin assignment (ties to lowest
    * cell), exact long sums with one `floor(s/n + 0.5)` division per
    * mean, empty cells keeping their centroid — [[SeededKMeans
    * .fitQuantized]] step for step. */
  private def kmCte(name: String, vecExpr: String, k: Int, iters: Int,
                    seed: Long, src: String = "qv"): String =
    s"""$name(i, cents) AS (
       |  SELECT 0, (SELECT list({'cell': CAST(rn - 1 AS INT), 'c': v} ORDER BY rn)
       |             FROM (SELECT $vecExpr AS v,
       |                     row_number() OVER (
       |                       ORDER BY md5(CAST(vec_id AS VARCHAR) || '|$seed'),
       |                       vec_id) AS rn
       |                   FROM $src) WHERE rn <= $k)
       |  UNION ALL
       |  SELECT i + 1,
       |    (SELECT list({'cell': x.cell, 'c': coalesce(nm.nc, x.c)} ORDER BY x.cell)
       |     FROM (SELECT unnest(cents) AS x)
       |     LEFT JOIN (
       |       SELECT cell, list(cm ORDER BY j) AS nc
       |       FROM (
       |         SELECT cell, j,
       |           CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cm
       |         FROM (
       |           SELECT a.cell AS cell, g.j AS j, a.v[g.j] AS v
       |           FROM (
       |             SELECT $vecExpr AS v,
       |               (SELECT y.cell FROM (SELECT unnest(cents) AS y)
       |                ORDER BY list_sum(list_transform(generate_series(1, len(v)),
       |                  jj -> (v[jj] - y.c[jj]) * (v[jj] - y.c[jj]))), y.cell
       |                LIMIT 1) AS cell
       |             FROM $src
       |           ) a, unnest(generate_series(1, len(a.v))) AS g(j)
       |         )
       |         GROUP BY cell, j
       |       )
       |       GROUP BY cell
       |     ) nm ON nm.cell = x.cell)
       |  FROM $name WHERE i < $iters
       |)""".stripMargin

  /** Full-vector fit CTEs + the final-centroid row (`fc`). */
  private def fullFitCtes: String =
    s"""$QvCte, ${kmCte("km", "q", K, Iters, Seed)},
       |fc AS (SELECT cents FROM km WHERE i = $Iters)""".stripMargin

  /** Final assignment of every vector under the fitted centroids. */
  private val AsgCte =
    """asg AS (
      |  SELECT qv.vec_id, qv.dv, qv.q,
      |    (SELECT y.cell FROM (SELECT unnest(fc.cents) AS y)
      |     ORDER BY list_sum(list_transform(generate_series(1, len(qv.q)),
      |       jj -> (qv.q[jj] - y.c[jj]) * (qv.q[jj] - y.c[jj]))), y.cell
      |     LIMIT 1) AS cell
      |  FROM qv, fc
      |)""".stripMargin

  // ------------------------------------------------------------------

  /** The deterministic fit ITSELF, hash-compared: one row per
    * (cell, coordinate) of the final centroid table plus the cell's
    * final population — the strongest possible check on the family
    * (any divergence anywhere in init/assign/mean arithmetic lands
    * here first, before the index queries can blur it through
    * rounding). */
  val q173SeededKmeans = QueryDef(
    "q173_seeded_kmeans",
    s"""WITH RECURSIVE $fullFitCtes,
       |$AsgCte,
       |cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors
       |        FROM asg GROUP BY cell)
       |SELECT CAST(f.x.cell AS INT) AS cell, CAST(g.j - 1 AS INT) AS j,
       |       f.x.c[g.j] AS c, coalesce(cnt.n_vectors, 0) AS n_vectors
       |FROM (SELECT unnest(cents) AS x FROM fc) f
       |CROSS JOIN unnest(generate_series(1, len(f.x.c))) AS g(j)
       |LEFT JOIN cnt ON cnt.cell = f.x.cell
       |ORDER BY cell, j""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = SeededKMeans.fit(emb, "vec_id", "embedding", K, Iters, Seed,
      cacheKey = Some(s"$d/embeddings"))
    import s.implicits._
    val cents = (for {
      (c, cell) <- model.centroids.zipWithIndex
      (v, j) <- c.zipWithIndex
    } yield (cell, j, v)).toSeq.toDF("cell", "j", "c")
    val counts = model.assign(emb, "embedding")
      .groupBy(col("cell")).agg(count(lit(1)).as("n_vectors"))
    cents.join(counts, Seq("cell"), "left_outer")
      .withColumn("n_vectors", coalesce(col("n_vectors"), lit(0L)))
      .orderBy(col("cell"), col("j"))
  }

  /** Single-query seeded-IVF top-10 — the hash-oracled twin of q47:
    * probe cells by exact integer centroid distance (ties to lowest
    * cell), exact cosine re-rank within the probed cells (round 6,
    * the q40/q41/q122 convention). */
  val q174IvfAnnSeeded = QueryDef(
    "q174_ivf_ann_seeded",
    s"""WITH RECURSIVE $fullFitCtes,
       |$AsgCte,
       |qrow AS (SELECT q AS qq, dv AS qdv FROM qv WHERE vec_id = 0),
       |probe AS (
       |  SELECT y.cell FROM (SELECT unnest(fc.cents) AS y FROM fc), qrow
       |  ORDER BY list_sum(list_transform(generate_series(1, len(qq)),
       |    jj -> (qq[jj] - y.c[jj]) * (qq[jj] - y.c[jj]))), y.cell
       |  LIMIT 3
       |)
       |SELECT a.vec_id, round(list_cosine_similarity(a.dv, qrow.qdv), 6) AS cos,
       |       a.cell
       |FROM asg a, qrow
       |WHERE a.cell IN (SELECT cell FROM probe) AND a.vec_id <> 0
       |ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin) { (s, d) =>
    SeededKMeans.ivfCosineTopKSeeded(Tables.embeddings(s, d), "vec_id",
      "embedding", queryId = 0L, k = 10, nlist = K, nprobe = 3,
      iters = Iters, seed = Seed, cacheKey = Some(s"$d/embeddings"))
  }

  /** Build + query the STORED seeded-IVF index — the hash-oracled twin
    * of q130: the fit is deterministic, so the materialized
    * cell-partitioned layout is a replayable artifact and the batch
    * query against it (in-row probe selection by integer centroid
    * distance, statically pruned scan, cosine re-rank) hash-compares.
    * The index dir is wiped per run (the q130 discipline — a stale
    * layout from an older nlist would change cells). */
  val q175IvfStoredSeeded = QueryDef(
    "q175_ivf_stored_seeded",
    s"""WITH RECURSIVE $fullFitCtes,
       |$AsgCte,
       |qs AS (SELECT vec_id AS query_id, dv AS qdv, q AS qq FROM qv
       |       WHERE vec_id % 100 = 0),
       |probes AS (
       |  SELECT query_id, qdv, cell FROM (
       |    SELECT qs.query_id, qs.qdv, y.cell,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY list_sum(list_transform(generate_series(1, len(qs.qq)),
       |          jj -> (qs.qq[jj] - y.c[jj]) * (qs.qq[jj] - y.c[jj]))), y.cell)
       |        AS prn
       |    FROM qs, fc, (SELECT unnest(fc.cents) AS y FROM fc) u(y)
       |  ) WHERE prn <= 3
       |),
       |ranked AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(a.dv, p.qdv), 6) AS cos,
       |    CAST(row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY round(list_cosine_similarity(a.dv, p.qdv), 6) DESC,
       |               a.vec_id) AS INT) AS rnk
       |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |)
       |SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val (build, probe) = q175Parts(s, d)
    build()
    probe()
  }

  /** q175 split into BUILD (deterministic fit + cell-partitioned
    * materialization; corpus-linear by design) and PROBE (the batch
    * query against the stored layout) — the q130Parts discipline
    * (round-9 verdict #1): inside a single combined ratio a probe
    * regression can hide under the dominant build term at 100×. The
    * probe batch pins to copy 0 ([[ScaleQueries.ProbeBatchFilter]]),
    * so the certified ratio measures probe cost vs corpus size at a
    * FIXED workload; on the real testdata dirs every id is below the
    * copy stride, so the registered query's output is unchanged. */
  private[graft] def q175Parts(s: org.apache.spark.sql.SparkSession,
      d: String): (() => Unit, () => org.apache.spark.sql.DataFrame) = {
    val dir = {
      val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
      s"target/tmp/q175_seeded_ivf_$sf"
    }
    val emb = Tables.embeddings(s, d)
    val build = () => {
      graft.sources.Sinks.wipeForRebuild(s, dir)
      SeededKMeans.buildIvfIndexSeeded(emb, "vec_id", "embedding", dir,
        nlist = K, iters = Iters, seed = Seed,
        cacheKey = Some(s"$d/embeddings"))
    }
    val probe = () => SeededKMeans.annJoinIvfSeededStored(s, dir,
        queries = emb.filter(expr(ScaleQueries.ProbeBatchFilter)),
        idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3)
      .orderBy(col("query_id"), col("rnk"))
    (build, probe)
  }

  /** PQ oracle pieces: m per-subspace fits (seeds `Seed + j`, the
    * [[graft.ops.Similarity.fitPq]] convention), every corpus vector
    * replaced by its per-subspace reconstruction (the argmin centroid
    * VECTOR — same value the code→codebook lookup yields), ADC = sum
    * of exact integer subspace distances. */
  private def pqOracle: String = {
    val dsub = 64 / PqM
    val subCtes = (0 until PqM).map { j =>
      kmCte(s"km$j", s"q[${j * dsub + 1}:${(j + 1) * dsub}]",
        PqKsub, PqIters, Seed + j)
    }.mkString(",\n")
    val fcCtes = (0 until PqM).map { j =>
      s"fc$j AS (SELECT cents FROM km$j WHERE i = $PqIters)"
    }.mkString(",\n")
    val slices = (0 until PqM).map { j =>
      s"q[${j * dsub + 1}:${(j + 1) * dsub}] AS s$j"
    }.mkString(", ")
    val recCols = (0 until PqM).map { j =>
      s"""(SELECT y.c FROM (SELECT unnest(fc$j.cents) AS y)
         |     ORDER BY list_sum(list_transform(generate_series(1, len(qs.s$j)),
         |       jj -> (qs.s$j[jj] - y.c[jj]) * (qs.s$j[jj] - y.c[jj]))),
         |       y.cell LIMIT 1) AS rec$j""".stripMargin
    }.mkString(",\n    ")
    val adc = (0 until PqM).map { j =>
      s"""list_sum(list_transform(generate_series(1, len(q.qs$j)),
         |      jj -> (q.qs$j[jj] - n.rec$j[jj]) * (q.qs$j[jj] - n.rec$j[jj])))""".stripMargin
    }.mkString(" + ")
    val fcFrom = (0 until PqM).map(j => s"fc$j").mkString(", ")
    val qSlices = (0 until PqM).map { j =>
      s"q[${j * dsub + 1}:${(j + 1) * dsub}] AS qs$j"
    }.mkString(", ")
    s"""WITH RECURSIVE $QvCte, $subCtes,
       |$fcCtes,
       |enc AS (
       |  SELECT qs.vec_id,
       |    $recCols
       |  FROM (SELECT vec_id, $slices FROM qv) qs, $fcFrom
       |),
       |q AS (SELECT vec_id AS query_id, $qSlices FROM qv
       |      WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id,
       |    CAST($adc AS BIGINT) AS adc
       |  FROM q, enc n WHERE n.vec_id <> q.query_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS INT) AS rnk
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, adc, rnk FROM ranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  /** Batch k-NN join under seeded-PQ ADC — the hash-oracled twin of
    * q158, and the only ANN query whose DISTANCES hash-compare raw
    * (no rounding): quantization, per-subspace fits, encoding, and
    * ADC are integer arithmetic end to end, so the exact long
    * distances match or the query fails. */
  val q176PqSeeded = QueryDef("q176_knn_join_pq_seeded", pqOracle) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val model = SeededKMeans.fitPq(emb, "vec_id", "embedding",
      m = PqM, ksub = PqKsub, iters = PqIters, seed = Seed,
      cacheKey = Some(s"$d/embeddings"))
    SeededKMeans.annJoinPqSeeded(
        queries = emb.filter(expr("vec_id % 100 = 0")), corpus = emb,
        idCol = "vec_id", vecCol = "embedding", k = 5, model = model)
      .orderBy(col("query_id"), col("rnk"))
  }

  /** ANN recall evaluation — the quality metric every approximate
    * index family reports, as a hash-oracled query: recall@5 of the
    * stored seeded-IVF index (nprobe=3 of nlist=8) against the exact
    * brute-force cosine top-5, per query. Only possible on the SEEDED
    * fit: both pipelines are externally replayable, so the recall
    * numbers themselves — not just row counts — hash-compare. (The
    * MLlib-fit indexes get spec-level recall bounds instead —
    * SimilaritySpec/PqSpec — because their cell layout is
    * engine-seeded.) */
  val q181SeededAnnRecall = QueryDef(
    "q181_seeded_ann_recall",
    s"""WITH RECURSIVE $fullFitCtes,
       |$AsgCte,
       |qs AS (SELECT vec_id AS query_id, dv AS qdv, q AS qq FROM qv
       |       WHERE vec_id % 100 = 0),
       |probes AS (
       |  SELECT query_id, qdv, cell FROM (
       |    SELECT qs.query_id, qs.qdv, y.cell,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY list_sum(list_transform(generate_series(1, len(qs.qq)),
       |          jj -> (qs.qq[jj] - y.c[jj]) * (qs.qq[jj] - y.c[jj]))), y.cell)
       |        AS prn
       |    FROM qs, fc, (SELECT unnest(fc.cents) AS y FROM fc) u(y)
       |  ) WHERE prn <= 3
       |),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, a.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY round(list_cosine_similarity(a.dv, p.qdv), 6) DESC,
       |                 a.vec_id) AS rnk
       |    FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  ) WHERE rnk <= 5
       |),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT qs.query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY round(list_cosine_similarity(e.dv, qs.qdv), 6) DESC,
       |                 e.vec_id) AS rnk
       |    FROM qs JOIN qv e ON e.vec_id <> qs.query_id
       |  ) WHERE rnk <= 5
       |),
       |hit AS (
       |  SELECT a.query_id, CAST(count(*) AS BIGINT) AS n_hit
       |  FROM approx a JOIN exact e
       |    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY a.query_id
       |)
       |SELECT qs.query_id, coalesce(hit.n_hit, 0) AS n_hit,
       |       CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / 5.0 AS recall
       |FROM qs LEFT JOIN hit ON qs.query_id = hit.query_id
       |ORDER BY qs.query_id""".stripMargin) { (s, d) =>
    val dir = {
      val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
      s"target/tmp/q181_seeded_ivf_$sf"
    }
    graft.sources.Sinks.wipeForRebuild(s, dir)
    val emb = Tables.embeddings(s, d)
    SeededKMeans.buildIvfIndexSeeded(emb, "vec_id", "embedding", dir,
      nlist = K, iters = Iters, seed = Seed,
      cacheKey = Some(s"$d/embeddings"))
    val queries = emb.filter(expr("vec_id % 100 = 0"))
    val approx = SeededKMeans.annJoinIvfSeededStored(s, dir, queries,
        "vec_id", "embedding", k = 5, nprobe = 3)
      .select(col("query_id"), col("neighbor_id"))
    val exact = graft.ops.Similarity.annJoinBruteForce(queries, emb,
        "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"))
    val hits = approx.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    queries.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall", col("n_hit").cast("double") / lit(5.0))
      .orderBy(col("query_id"))
  }

  /** Incremental index maintenance, hash-oracled — the q132 shape
    * (build on half the corpus, APPEND the other half, batch-query the
    * stored index) under the seeded fit, where the whole lifecycle
    * replays: the oracle fits centroids on the EVEN ids only (the
    * build set), assigns EVERY vector to those centroids (append
    * assignment is the same pure argmin the fit uses, so
    * built+appended == one full assignment), and replays the q175
    * probe/rank pipeline. q132's MLlib fit keeps the production
    * maintenance op rows-only; this is its verified twin. */
  val q182IvfAppendSeeded = QueryDef(
    "q182_ivf_append_seeded",
    s"""WITH RECURSIVE $QvCte,
       |qve AS (SELECT * FROM qv WHERE vec_id % 2 = 0),
       |${kmCte("km", "q", K, Iters, Seed, src = "qve")},
       |fc AS (SELECT cents FROM km WHERE i = $Iters),
       |$AsgCte,
       |qs AS (SELECT vec_id AS query_id, dv AS qdv, q AS qq FROM qv
       |       WHERE vec_id % 100 = 0),
       |probes AS (
       |  SELECT query_id, qdv, cell FROM (
       |    SELECT qs.query_id, qs.qdv, y.cell,
       |      row_number() OVER (PARTITION BY qs.query_id
       |        ORDER BY list_sum(list_transform(generate_series(1, len(qs.qq)),
       |          jj -> (qs.qq[jj] - y.c[jj]) * (qs.qq[jj] - y.c[jj]))), y.cell)
       |        AS prn
       |    FROM qs, fc, (SELECT unnest(fc.cents) AS y FROM fc) u(y)
       |  ) WHERE prn <= 3
       |),
       |ranked AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |    round(list_cosine_similarity(a.dv, p.qdv), 6) AS cos,
       |    CAST(row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY round(list_cosine_similarity(a.dv, p.qdv), 6) DESC,
       |               a.vec_id) AS INT) AS rnk
       |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |)
       |SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin) { (s, d) =>
    val (build, probe) = q182Parts(s, d)
    build()
    probe()
  }

  /** q182 split into BUILD (even-half fit + append of the odd half —
    * the whole index-maintenance lifecycle, corpus-linear by design)
    * and PROBE, with the copy-0-pinned batch — the q175Parts
    * discipline applied to the append path (round-9 verdict #1 asked
    * for exactly this while the machinery was out). */
  private[graft] def q182Parts(s: org.apache.spark.sql.SparkSession,
      d: String): (() => Unit, () => org.apache.spark.sql.DataFrame) = {
    val dir = {
      val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
      s"target/tmp/q182_seeded_ivf_$sf"
    }
    val emb = Tables.embeddings(s, d)
    val build = () => {
      graft.sources.Sinks.wipeForRebuild(s, dir)
      SeededKMeans.buildIvfIndexSeeded(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", dir,
        nlist = K, iters = Iters, seed = Seed,
        // distinct token: the even-half fit must never share the
        // full-corpus cache entry of q173-q175
        cacheKey = Some(s"$d/embeddings#even"))
      SeededKMeans.appendToIvfIndexSeeded(s, dir,
        emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
    }
    val probe = () => SeededKMeans.annJoinIvfSeededStored(s, dir,
        queries = emb.filter(expr(ScaleQueries.ProbeBatchFilter)),
        idCol = "vec_id", vecCol = "embedding", k = 5, nprobe = 3)
      .orderBy(col("query_id"), col("rnk"))
    (build, probe)
  }

  val all: Seq[QueryDef] = Seq(
    q173SeededKmeans, q174IvfAnnSeeded, q175IvfStoredSeeded, q176PqSeeded,
    q181SeededAnnRecall, q182IvfAppendSeeded)
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Top principal direction of the embedding corpus — distributed covariance
  * (Gram) accumulation + fixed-point power iteration.
  *
  * Dimensionality reduction is the standard precursor to embedding curation
  * (OPQ rotation fits, whitening before cosine thresholds, low-rank energy
  * checks); its distributed core is the d×d second-moment matrix, which is
  * exactly one mergeable aggregation. Everything downstream of that matrix
  * is O(d²) driver work.
  *
  * Fixed-point contract (FIXTURES.md): components quantize shift-positive
  * (`round((x+1)·10^5)` — [[Cluster.quantizeShift]]); one [[Pca.GramAgg]]
  * pass accumulates exact integer Σ qᵢqⱼ (upper triangle), Σ qᵢ and n;
  * centered covariance comes from the integer identity
  * `Cov_ij = Σqᵢqⱼ − mᵢSⱼ − mⱼSᵢ + n·mᵢmⱼ` with `mᵢ = Sᵢ // n` — EXACT for
  * any integer constants mᵢ, so the oracle's explicit `(qᵢ−mᵢ)(qⱼ−mⱼ)`
  * self-join reproduces it bit-for-bit. Power iteration stays integer:
  * matrix scaled down by 10^6, w₀ = 1000, per-step renorm
  * `w = u // (max|u| // 1000 + 1)` — truncating division agrees between
  * Spark/JVM and DuckDB on negatives too (both truncate toward zero).
  *
  * Scale shape (100 TB): ONE corpus scan, no join, no explode — the
  * aggregation buffer is d(d+1)/2 + d + 1 longs (d=64 → ~2 KB), partially
  * aggregated map-side and merged associatively like the KMV/Bloom/HLL
  * aggregators, so the only exchange carries one buffer per partition.
  * Driver state is O(d²). Exactness bound: quantized products are ≤ 4·10¹⁰,
  * so Long accumulation is exact to ~2·10⁸ rows per cluster at scale 10^5;
  * beyond that, drop scaleExp to 4 (buys 100×) or split the corpus and merge
  * the integer buffers — the aggregator's merge is exact either way.
  */
object Pca {

  /** Mergeable exact-integer second-moment aggregator over quantized
    * vectors: buffer = upper-triangle Σ qᵢqⱼ ++ Σ qᵢ ++ [n]. */
  final class GramAgg(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Seq[Double], Array[Long], Array[Long]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Long] = new Array[Long](tri + dim + 1)

    override def reduce(buf: Array[Long], v: Seq[Double]): Array[Long] = {
      val a = v.toArray
      require(a.length == dim, s"GramAgg(dim=$dim) got a ${a.length}-dim vector")
      var i = 0
      var idx = 0
      while (i < dim) {
        val ai = a(i)
        var j = i
        while (j < dim) {
          buf(idx) += (ai * a(j)).toLong
          idx += 1
          j += 1
        }
        buf(tri + i) += ai.toLong
        i += 1
      }
      buf(tri + dim) += 1L
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Driver-side fit: exact integer covariance matrix + the fixed-point
    * top direction after `iters` power steps. One distributed pass. */
  private[graft] def fitDirection(emb: DataFrame, dim: Int, iters: Int,
      scaleExp: Int): (Array[Array[Long]], Array[Long], Array[Long]) = {
    require(iters >= 1)
    val scale = math.pow(10.0, scaleExp)
    val tri = dim * (dim + 1) / 2

    val q = emb.select(Cluster.quantizeShift(col("embedding"), scale).as("q"))
    val buf = q.select(udaf(new GramAgg(dim)).apply(col("q")).as("g"))
      .head().getSeq[Long](0).toArray

    val n = buf(tri + dim)
    require(n > 0, "pca: empty corpus")
    val s = Array.tabulate(dim)(i => buf(tri + i))
    val m = s.map(_ / n) // positive integer means, truncating like // and div
    // full covariance from the upper triangle + the exact integer identity
    val cov = Array.ofDim[Long](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = buf(idx) - m(i) * s(j) - m(j) * s(i) + n * m(i) * m(j)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }

    // fixed-point power iteration on the driver (O(d²) per step)
    val mv = cov.map(_.map(_ / 1000000L))
    var w = Array.fill(dim)(1000L)
    for (_ <- 1 to iters) {
      val u = Array.tabulate(dim) { j =>
        var acc = 0L; var i = 0
        while (i < dim) { acc += mv(i)(j) * w(i); i += 1 }
        acc
      }
      val sc = u.map(math.abs).max / 1000L + 1L
      w = u.map(_ / sc)
    }
    (cov, w, m)
  }

  /** One row per dimension: `pos, var_diag (exact integer Cov_pp),
    * w (fixed-point top-eigenvector component after `iters` power steps)`. */
  def pcaPowerFixedPoint(emb: DataFrame, dim: Int, iters: Int = 2,
                         scaleExp: Int = 5): DataFrame = {
    val (cov, w, _) = fitDirection(emb, dim, iters, scaleExp)
    val rows = (0 until dim).map(p => (p.toLong, cov(p)(p), w(p)))
    emb.sparkSession.createDataFrame(rows).toDF("pos", "var_diag", "w").orderBy("pos")
  }

  /** Per-label distribution of the principal score `q · w` (exact integer
    * dot of the quantized vector with the fitted fixed-point direction):
    * `label, n_vecs, mean_score (integer div), min_score, max_score`.
    *
    * The fit collects nothing but the Gram buffer; the projection is a
    * map-only codegen'd dot against the literal direction followed by one
    * label-keyed partial-agg shuffle — the "order the corpus along its
    * dominant axis" primitive (curriculum sort keys, diversity strata,
    * whitening checks). */
  def pcaProjectByLabel(emb: DataFrame, dim: Int, iters: Int = 2,
                        scaleExp: Int = 5): DataFrame = {
    val (_, w, _) = fitDirection(emb, dim, iters, scaleExp)
    val scale = math.pow(10.0, scaleExp)
    val score = DotProduct.dot(Cluster.quantizeShift(col("embedding"), scale),
      typedLit(w.map(_.toDouble).toSeq)).cast("long")
    emb.select(col("label").cast("long").as("label"), score.as("score"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum(col("score")).as("ss"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .select(col("label"), col("n_vecs"),
        call_function("div", col("ss"), col("n_vecs")).as("mean_score"),
        col("min_score"), col("max_score"))
      .orderBy("label")
  }

  /** PCA reconstruction-error outliers: the corpus rows whose centered
    * vector is LEAST explained by the fitted top direction — the textbook
    * one-component anomaly score, in EXACT integers. For centered d and
    * direction w, the orthogonal residual satisfies
    * |d_⊥|²·|w|² = |d|²·|w|² − (d·w)² (Cauchy–Schwarz ⇒ never negative),
    * so ranking on `dd·ww − proj²` avoids the division and the square
    * root entirely. Magnitude budget: qv < 2e5 and |w| ≤ 1000 keep
    * dd ≤ 2.6e12, proj ≤ 1.3e10, ww ≤ 6.4e7 — every per-row double is an
    * exact integer < 2^53; only the intermediate products cross Int64
    * (exact decimals in Spark, HUGEINT in DuckDB), and the reported
    * `resid_q = (dd·ww − proj²) // ww = |d_⊥|²` is back in BIGINT range.
    *
    * Scale shape: the fit is one Gram-aggregate collect; scoring is a
    * MAP-ONLY pass of three literal dots (no joins at all); top-k is
    * TakeOrderedAndProject. */
  def pcaOutliers(emb: DataFrame, dim: Int, iters: Int = 2,
                  scaleExp: Int = 5, topK: Int = 20): DataFrame = {
    val (_, w, m) = fitDirection(emb, dim, iters, scaleExp)
    val scale = math.pow(10.0, scaleExp)
    val q = Cluster.quantizeShift(col("embedding"), scale)
    val wLit = typedLit(w.map(_.toDouble).toSeq)
    val mLit = typedLit(m.map(_.toDouble).toSeq)
    val mm = m.map(x => x * x).sum            // ≤ 2.6e12 — exact in double
    val mw = m.zip(w).map { case (a, b) => a * b }.sum // ≤ 1.3e13 — exact in double
    val ww = w.map(x => x * x).sum            // ≤ 6.4e7
    val dd = (DotProduct.dot(q, q) - lit(2.0) * DotProduct.dot(q, mLit)
      + lit(mm.toDouble)).cast("long")
    val proj = (DotProduct.dot(q, wLit) - lit(mw.toDouble)).cast("long")
    // |d_⊥|² = (dd·ww − proj²) // ww back in BIGINT range (≤ dd ≤ 2.6e12);
    // the intermediate crosses Int64 so it rides exact decimals, and the
    // output stays integer-typed on both engines (DuckDB's python client
    // degrades DECIMAL(38) to float64, so a decimal OUTPUT can't be hashed)
    emb.select(col("vec_id"), dd.as("dd"), proj.as("proj"))
      .withColumn("resid_q",
        call_function("div",
          col("dd").cast("decimal(19,0)") * lit(java.math.BigDecimal.valueOf(ww))
            - col("proj").cast("decimal(19,0)") * col("proj").cast("decimal(19,0)"),
          lit(java.math.BigDecimal.valueOf(ww))).cast("long"))
      .orderBy(col("resid_q").desc, col("vec_id"))
      .limit(topK)
  }

  /** DuckDB oracle for [[pcaOutliers]]: the shared fit CTEs, per-vector
    * integer dd/proj, and the HUGEINT residual rank. */
  def pcaOutliersOracle(iters: Int = 2, scaleExp: Int = 5,
                        topK: Int = 20): String =
    s"""WITH ${pcaCtes(iters, scaleExp)},
       |per AS (SELECT d.vec_id,
       |    CAST(SUM(d.dv * d.dv) AS BIGINT) AS dd,
       |    CAST(SUM(d.dv * w$iters.w) AS BIGINT) AS proj
       |  FROM d JOIN w$iters ON d.pos = w$iters.pos GROUP BY 1),
       |nw AS (SELECT CAST(SUM(w * w) AS BIGINT) AS ww FROM w$iters)
       |SELECT vec_id, dd, proj,
       |  CAST((CAST(dd AS HUGEINT) * ww - CAST(proj AS HUGEINT) * proj) // ww
       |    AS BIGINT) AS resid_q
       |FROM per, nw
       |ORDER BY resid_q DESC, vec_id LIMIT $topK""".stripMargin

  /** Shared oracle WITH-body: quantized long-form corpus `v`, centered
    * self-join covariance `g`, and the unrolled integer power steps
    * through `w{iters}`. */
  private def pcaCtes(iters: Int, scaleExp: Int): String = {
    require(scaleExp == 5, "oracle literal is written for scaleExp = 5")
    val steps = (1 to iters).map { t =>
      s"""u$t AS (
         |  SELECT gm.j AS pos, SUM(gm.mv * w${t - 1}.w) AS u
         |  FROM gm JOIN w${t - 1} ON gm.i = w${t - 1}.pos GROUP BY 1),
         |s$t AS (SELECT MAX(ABS(u)) // 1000 + 1 AS s FROM u$t),
         |w$t AS (SELECT pos, CAST(u // (SELECT s FROM s$t) AS BIGINT) AS w FROM u$t)""".stripMargin
    }.mkString(",\n")
    s"""v AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
       |         CAST(round((unnest(CAST(embedding AS DOUBLE[])) + 1.0) * 100000.0) AS BIGINT) AS qv
       |  FROM embeddings),
       |mn AS (SELECT pos, CAST(SUM(qv) // COUNT(*) AS BIGINT) AS m FROM v GROUP BY pos),
       |d AS (SELECT vec_id, v.pos, qv - m AS dv FROM v JOIN mn ON v.pos = mn.pos),
       |g AS (SELECT a.pos AS i, b.pos AS j, CAST(SUM(a.dv * b.dv) AS BIGINT) AS gv
       |      FROM d a JOIN d b ON a.vec_id = b.vec_id GROUP BY 1, 2),
       |gm AS (SELECT i, j, gv // 1000000 AS mv FROM g),
       |w0 AS (SELECT pos, CAST(1000 AS BIGINT) AS w FROM mn),
       |$steps""".stripMargin
  }

  /** DuckDB oracle for [[pcaPowerFixedPoint]]: explicit centered self-join
    * covariance + the same unrolled integer power steps as chained CTEs. */
  def pcaOracle(dim: Int, iters: Int = 2, scaleExp: Int = 5): String =
    s"""WITH ${pcaCtes(iters, scaleExp)}
       |SELECT CAST(g.i AS BIGINT) AS pos, g.gv AS var_diag, w$iters.w AS w
       |FROM g JOIN w$iters ON g.i = w$iters.pos
       |WHERE g.i = g.j ORDER BY pos""".stripMargin

  /** DuckDB oracle for [[pcaProjectByLabel]]: the same fit CTEs, then the
    * per-vector integer score join and a per-label aggregate. */
  def pcaProjectOracle(iters: Int = 2, scaleExp: Int = 5): String =
    s"""WITH ${pcaCtes(iters, scaleExp)},
       |sc AS (SELECT v.vec_id, CAST(SUM(v.qv * w$iters.w) AS BIGINT) AS score
       |       FROM v JOIN w$iters ON v.pos = w$iters.pos GROUP BY 1)
       |SELECT CAST(e.label AS BIGINT) AS label, COUNT(*) AS n_vecs,
       |  CAST(SUM(sc.score) // COUNT(*) AS BIGINT) AS mean_score,
       |  CAST(MIN(sc.score) AS BIGINT) AS min_score,
       |  CAST(MAX(sc.score) AS BIGINT) AS max_score
       |FROM sc JOIN embeddings e ON sc.vec_id = e.vec_id
       |GROUP BY 1 ORDER BY label""".stripMargin
}

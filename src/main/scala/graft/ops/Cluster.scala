package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Distributed Lloyd k-means over an embedding column, in fixed-point
  * integer space so every iteration is bit-reproducible across engines
  * (the oracle unrolls the same iterations as chained DuckDB CTEs).
  *
  * The reference delegates all analytics to the backing RDBMS
  * (`lib/fluent/plugin/in_sql.rb:129-135` only ever emits one keyset
  * SELECT shape); clustering is part of the analytics surface this engine
  * supplies on top. K-means is the workhorse grouping step of
  * training-data curation — SemDeDup cells, domain discovery, cluster-
  * balanced mixing all start from a corpus-scale Lloyd fit.
  *
  * Fixed-point contract (FIXTURES.md round-4 rules):
  *  - quantize each component to `round((x + 1) · 10^scaleExp)` BIGINT —
  *    the +1 shift keeps every quantized value, centroid sum and mean
  *    POSITIVE for unit-normalized inputs (|x| < 1), so integer division
  *    (Spark `div` / DuckDB `//`) never sees a negative operand, and the
  *    shift cancels in every distance difference. (Inputs that stray past
  *    −1 — e.g. the noise-amplified sf1x probe fixture — stay correct
  *    regardless: both engines truncate division toward zero on negatives
  *    too; the shift just removes the sign question entirely on the
  *    driver-checked fixtures.);
  *  - centroid update is `sum div count` on exact integer sums — no
  *    float mean, nothing order-dependent;
  *  - assignment encodes argmin as `min(dist·k + cid)`: distances are
  *    exact integers (≤ ~2^43 for dim 64 at scale 1e5, far inside the
  *    2^53 double-exact range), so `least` over the k encoded doubles is
  *    an exact integer compare and ties break to the smallest cid — the
  *    identical encoding the oracle computes with HUGEINT arithmetic.
  *
  * Scale shape (100 TB): assignment is a map-only projection against k
  * literal centroid arrays (one codegen'd `graft_dot` per centroid via
  * ‖q−c‖² = q·q − 2·q·c + c·c — no join, no shuffle, cost k·dim mults
  * per row); the update is ONE partially-aggregated shuffle of at most
  * k·dim rows per partition (posexplode → groupBy(cid, pos) sum/count),
  * then k·dim rows to the driver to form the next literal centroids.
  * Per-iteration cost is therefore iters+1 corpus scans and iters tiny
  * exchanges — the textbook distributed-Lloyd layout. Driver state is
  * O(k·dim), never O(rows). (Init here is "first k vectors by id" for
  * determinism; a production fit would swap in k-means|| seeding —
  * Bahmani et al., VLDB 2012 — without touching the iteration shape.)
  *
  * Clusters that receive no members in an update round are DROPPED from
  * subsequent rounds (mirroring the oracle, where the centroid CTE simply
  * has no rows for that cid) — cids of surviving clusters are stable.
  */
object Cluster {

  /** Shift-positive quantization: `round((x + 1) · scale)` per component,
    * kept as integer-valued `array<double>` so the codegen'd `graft_dot`
    * kernel consumes it directly. Shared by the k-means and PCA tiers. */
  private[graft] def quantizeShift(vec: org.apache.spark.sql.Column,
                                   scale: Double): org.apache.spark.sql.Column =
    transform(vec.cast("array<double>"), x => round((x + lit(1.0)) * lit(scale), 0))

  /** One row per surviving cluster after `iters` Lloyd updates and a final
    * assignment: `cid, size, avg_qdist (mean quantized squared L2, integer
    * div), centroid_sum (Σ of the final centroid's quantized components)`.
    */
  def kmeansFixedPoint(emb: DataFrame, k: Int, iters: Int,
                       scaleExp: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    val (assigned, centers) = fitAssign(emb, k, iters, scaleExp)

    val centroidSums = centers.map { case (cid, c) => (cid, c.map(_.toLong).sum) }
    val csum = spark.createDataFrame(centroidSums).toDF("cid", "centroid_sum")

    assigned
      .groupBy("cid")
      .agg(count(lit(1)).as("size"), sum(col("qdist")).as("sd"))
      .join(broadcast(csum), "cid")
      .select(col("cid").cast("long").as("cid"), col("size"),
        call_function("div", col("sd"), col("size")).as("avg_qdist"),
        col("centroid_sum"))
      .orderBy("cid")
  }

  /** The fitted final assignment (`vec_id, cid, qdist` + the quantized
    * vector columns) and the final centroids. */
  private def fitAssign(emb: DataFrame, k: Int, iters: Int,
                        scaleExp: Int): (DataFrame, Seq[(Int, Array[Double])]) = {
    require(k > 0 && iters >= 0)
    val scale = math.pow(10.0, scaleExp)

    // Quantized corpus: q = round((x + 1) * 10^scaleExp) per component,
    // kept as integer-valued array<double> so the codegen'd graft_dot
    // kernel ranks it directly. The lambda body is two primitive ops, so
    // the transform() interpreter overhead stays negligible (the known-hot
    // HOF trap is non-trivial embedded expressions, not arithmetic).
    val q = emb.select(col("vec_id"), quantizeShift(col("embedding"), scale).as("q"))
      .withColumn("qq", DotProduct.dot(col("q"), col("q")))

    // Deterministic seed: the k lowest-id vectors, quantized through the
    // SAME column expression (collected, so engine == oracle bit-for-bit).
    var centers: Seq[(Int, Array[Double])] =
      q.filter(col("vec_id") < k).orderBy("vec_id")
        .select(col("vec_id"), col("q")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray)).toSeq
    require(centers.size == k, s"kmeans init expects vec_ids 0..${k - 1}")

    // Assignment: enc = dist·k + cid, dist = ‖q−c‖² via the 3-term
    // expansion against literal centroids. Map-only; no shuffle.
    def assign(centersNow: Seq[(Int, Array[Double])]): DataFrame = {
      val encoded = centersNow.map { case (cid, c) =>
        val cc = { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }
        (col("qq") - lit(2.0) * DotProduct.dot(col("q"), typedLit(c.toSeq)) + lit(cc)) *
          lit(k.toDouble) + lit(cid.toDouble)
      }
      q.withColumn("enc", least(encoded: _*).cast("long"))
        .withColumn("cid", (col("enc") % k).cast("int"))
        .withColumn("qdist", call_function("div", col("enc"), lit(k.toLong)))
    }

    for (_ <- 1 to iters) {
      // Update: one bounded shuffle (≤ k·dim rows per map partition after
      // partial aggregation), k·dim rows to the driver.
      val upd = assign(centers)
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy("cid", "pos")
        .agg(sum(col("qv").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      centers = upd.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val c = new Array[Double](dim)
        // sum / count on positive longs truncates exactly like Spark `div`
        // and DuckDB `//` — no float mean anywhere.
        rows.foreach(r => c(r.getInt(1)) = (r.getLong(2) / r.getLong(3)).toDouble)
        (cid, c)
      }
    }

    (assign(centers), centers)
  }

  /** Cluster-balanced exemplar selection: the `m` vectors closest to each
    * final centroid (ties to the smaller vec_id) — the "pick representative
    * documents per cluster" step of cluster-proportional data curation.
    *
    * Scale shape: a single `row_number` window partitioned by cid would
    * shuffle the whole corpus into k partitions — a skew cliff for small k.
    * Instead the top-m runs in TWO phases: phase 1 ranks within
    * (cid, vec_id % salts) — k·salts balanced partitions — and keeps m per
    * salt; phase 2 ranks the surviving ≤ k·salts·m candidate rows. The
    * global per-cid top-m is contained in the union of per-salt top-ms, so
    * the result is IDENTICAL to the naive single-window form (which is what
    * the oracle runs) at any salts count. */
  def clusterExemplars(emb: DataFrame, k: Int, iters: Int, m: Int,
                       salts: Int = 8, scaleExp: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (assigned, _) = fitAssign(emb, k, iters, scaleExp)
    val salted = assigned.select(col("vec_id"), col("cid"), col("qdist"))
      .withColumn("salt", pmod(col("vec_id"), lit(salts)))
    val w1 = Window.partitionBy("cid", "salt").orderBy(col("qdist"), col("vec_id"))
    val cand = salted.withColumn("r1", row_number().over(w1)).filter(col("r1") <= m)
    val w2 = Window.partitionBy("cid").orderBy(col("qdist"), col("vec_id"))
    cand.withColumn("rn", row_number().over(w2)).filter(col("rn") <= m)
      .select(col("cid").cast("long").as("cid"), col("rn").cast("long").as("rn"),
        col("vec_id"), col("qdist"))
      .orderBy("cid", "rn")
  }

  /** DuckDB oracle for [[kmeansFixedPoint]]: the identical quantization,
    * unrolled Lloyd iterations as chained CTEs (aggregates are not allowed
    * in recursive CTE terms — FIXTURES.md), argmin via `MIN(d·k + cid)`,
    * centroid update via `SUM // COUNT` on the always-positive quantized
    * values. */
  /** Shared oracle WITH-body: quantized long-form corpus `v`, seed
    * centroids `c0`, and the unrolled Lloyd layers through the final
    * assignment `a{iters+1}` (enc = dist·k + cid). */
  private def kmeansCtes(k: Int, iters: Int, scaleExp: Int): String = {
    require(scaleExp == 5, "oracle literal is written for scaleExp = 5")
    val layers = (1 to iters + 1).map { i =>
      val prev = s"c${i - 1}"
      val dist =
        s"""d$i AS (
           |  SELECT v.vec_id, c.cid, SUM((v.qv - c.cv) * (v.qv - c.cv)) AS d
           |  FROM v JOIN $prev c ON v.pos = c.pos
           |  GROUP BY v.vec_id, c.cid),
           |a$i AS (
           |  SELECT vec_id, CAST(MIN(d * $k + cid) AS BIGINT) AS enc
           |  FROM d$i GROUP BY vec_id)""".stripMargin
      if (i <= iters)
        dist + s""",
           |c$i AS (
           |  SELECT a$i.enc % $k AS cid, v.pos,
           |         CAST(SUM(v.qv) // COUNT(*) AS BIGINT) AS cv
           |  FROM v JOIN a$i USING (vec_id)
           |  GROUP BY 1, 2)""".stripMargin
      else dist
    }.mkString(",\n")
    s"""v AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
       |         CAST(round((unnest(CAST(embedding AS DOUBLE[])) + 1.0) * 100000.0) AS BIGINT) AS qv
       |  FROM embeddings),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, pos, qv AS cv FROM v WHERE vec_id < $k),
       |$layers""".stripMargin
  }

  def kmeansOracle(k: Int, iters: Int, scaleExp: Int = 5): String = {
    s"""WITH ${kmeansCtes(k, iters, scaleExp)},
       |stats AS (
       |  SELECT enc % $k AS cid, COUNT(*) AS size, SUM(enc // $k) AS sd
       |  FROM a${iters + 1} GROUP BY 1),
       |csum AS (SELECT cid, SUM(cv) AS centroid_sum FROM c$iters GROUP BY cid)
       |SELECT CAST(s.cid AS BIGINT) AS cid, s.size AS size,
       |       CAST(s.sd // s.size AS BIGINT) AS avg_qdist,
       |       CAST(m.centroid_sum AS BIGINT) AS centroid_sum
       |FROM stats s JOIN csum m ON s.cid = m.cid
       |ORDER BY cid""".stripMargin
  }

  /** DuckDB oracle for [[clusterExemplars]]: the NAIVE single-window
    * per-cluster top-m (the salted two-phase engine form is provably
    * equivalent). */
  def exemplarsOracle(k: Int, iters: Int, m: Int, scaleExp: Int = 5): String =
    s"""WITH ${kmeansCtes(k, iters, scaleExp)},
       |sel AS (SELECT vec_id, enc % $k AS cid, enc // $k AS qd FROM a${iters + 1}),
       |r AS (SELECT vec_id, cid, qd,
       |        ROW_NUMBER() OVER (PARTITION BY cid ORDER BY qd, vec_id) AS rn
       |      FROM sel)
       |SELECT CAST(cid AS BIGINT) AS cid, CAST(rn AS BIGINT) AS rn,
       |       vec_id, CAST(qd AS BIGINT) AS qdist
       |FROM r WHERE rn <= $m ORDER BY cid, rn""".stripMargin
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.StageOps

/** Mergeable cardinality sketches with engine-reproducible hash families.
  *
  * `approx_count_distinct` (HyperLogLog++) is the built-in fast path, but
  * its sketch bits are engine-internal — no external oracle can check it.
  * KMV ("k minimum values" / bottom-k, Bar-Yossef et al. 2002) estimates
  * |D| from the k-th smallest normalized hash of the distinct values:
  *
  *   est = (k - 1) / h_(k)          (exact count when |D| < k)
  *
  * With an md5-derived hash both engines compute the identical estimate
  * bit-for-bit, so the approximate-distinct TIER gets a full DuckDB oracle.
  *
  * Scale shape: the bottom-k set is a mergeable sketch (union = k smallest
  * of the union), so partial aggregation applies; this implementation
  * computes it relationally — one distinct shuffle + one window rank —
  * which AQE handles at any group count. Error is ~1/sqrt(k-2).
  */
object Sketch {

  /** Normalized md5-derived hash in (0, 1]: first 60 bits / 2^60. */
  def portableUnitHash(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("double") /
      lit(1152921504606846976.0) // 2^60

  /** Per-group KMV distinct estimate of `valueCol`, alongside the exact
    * count (the oracle compares both). Output: groupCols*, n_exact, est. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // COUNT(DISTINCT x) semantics: NULL values don't count (and a null
    // hash would crash the typed Aggregator twin's primitive encoder)
    val d = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
      .distinct()
      .withColumn("h", portableUnitHash(col(valueCol)))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h").asc, col(valueCol).asc)
    d.withColumn("rnk", row_number().over(w))
      .withColumn("n_exact", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("rnk") === least(lit(k.toLong), col("n_exact")))
      .withColumn("est",
        when(col("n_exact") < k, col("n_exact").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) / col("h"), 4)))
      .select(col(groupCol), col("n_exact"), col("est"))
  }

  /** The same KMV estimate as a typed `Aggregator` — the PRODUCTION form:
    * one pass, mergeable partial sketches (map-side combine keeps the
    * shuffle at k longs per group), no distinct + window shuffle. The
    * relational `kmvDistinct` (which carries the DuckDB oracle) doubles as
    * its test oracle: both produce the identical estimate for groups whose
    * 60-bit hashes don't collide (p ≈ n²/2^61).
    *
    * Buffer = sorted ascending array of the k smallest DISTINCT hashes.
    * Input = the raw 60-bit hash (compute with [[portableUnitHashLong]]). */
  final class KmvAgg(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Seq[Long], Double] {
    require(k >= 2, "KMV needs k >= 2")
    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.length >= k && h >= buf.last) buf
      else {
        val i = searchInsert(buf, h)
        if (i < buf.length && buf(i) == h) buf // already present
        else ((buf.take(i) :+ h) ++ buf.drop(i)).take(k)
      }

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)

    override def finish(buf: Seq[Long]): Double =
      if (buf.length < k) buf.length.toDouble
      else {
        val hk = buf.last.toDouble / 1152921504606846976.0 // 2^60
        // BigDecimal.valueOf (canonical repr), matching Spark's Round —
        // the exact-binary-expansion constructor rounds boundary values
        // differently at scale 4
        java.math.BigDecimal.valueOf((k - 1).toDouble / hk)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      }

    private def searchInsert(buf: Seq[Long], h: Long): Int = {
      var lo = 0; var hi = buf.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < h) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Raw 60-bit portable hash (input to [[KmvAgg]]). */
  def portableUnitHashLong(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** KMV set algebra (Beyer et al. 2007, "On synopses for distinct-value
    * estimation"): distinct-value estimates for two subsets A and B of
    * `valueCol` rows, their UNION, and their INTERSECTION — all from
    * bottom-k sketches. Union: the bottom-k of K(A) ∪ K(B) IS the sketch
    * of A ∪ B (mergeability). Intersection: with M the merged sketch,
    * ρ = |{v ∈ M : v ∈ K(A) ∧ v ∈ K(B)}| / |M| and est = ρ · est_union —
    * computed in exact e4 integer units (`est_union_e4 · i_m div k_m`) so
    * the quotient never meets a rounding law (the repo's micro-unit
    * contract); when the union has fewer than k values every estimate
    * degenerates to the exact count.
    *
    * Scale shape: one distinct shuffle over the qualifying values, then
    * k-sized windows/joins (k ≤ 64 rows); the scalar aggregates meet on a
    * constant-key broadcast equi-join, not a nested-loop product.
    *
    * @return one row: n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
    *         est_a, est_b, est_union, est_inter */
  def kmvSetOps(df: DataFrame, valueCol: String, condA: Column, condB: Column,
                k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val flags = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"), condA.as("ia"), condB.as("ib"))
      .groupBy("v").agg(max("ia").as("ia"), max("ib").as("ib"))
      .filter(col("ia") || col("ib"))
      .withColumn("h", portableUnitHash(col("v")))
    val exact = flags.agg(
      count(when(col("ia"), 1)).as("n_a_exact"),
      count(when(col("ib"), 1)).as("n_b_exact"),
      count(lit(1)).as("n_union_exact"),
      count(when(col("ia") && col("ib"), 1)).as("n_inter_exact"))
    // sort+limit (NOT a row_number window): plans TakeOrderedAndProject —
    // per-partition bottom-k + driver merge, no single-task global sort
    def bottomK(c: Column): DataFrame = flags.filter(c).select(col("v"), col("h"))
      .orderBy(col("h").asc, col("v").asc).limit(k)
    // ka/kb/m are k-row BOUNDED sketches each referenced 2-3 times (merge,
    // intersection probe, tau aggregate); unstaged, every reference
    // re-ran the whole flags pipeline (scan + distinct-v groupBy + md5) —
    // ~11 executions for one query. Stage the tiny sketch tables
    // (Materialize lineage cut); flags itself stays lazy (distinct-key
    // sized, the scale-correct trade).
    val ka = bottomK(col("ia")).staged()
    val kb = bottomK(col("ib")).staged()
    val m = ka.union(kb).distinct()
      .orderBy(col("h").asc, col("v").asc).limit(k).staged()
    def sketchAgg(s: DataFrame, kName: String, tauName: String): DataFrame =
      s.agg(count(lit(1)).as(kName), max(col("h")).as(tauName))
    val im = m.join(ka.select(col("v"), lit(1).as("in_a")), Seq("v"), "left_outer")
      .join(kb.select(col("v"), lit(1).as("in_b")), Seq("v"), "left_outer")
      .agg(count(when(col("in_a") === 1 && col("in_b") === 1, 1)).as("i_m"))
    // the scalar one-row aggregates meet via pad→union→max, NOT a join — a
    // join on a constant key constant-folds into a nested-loop product
    val longCols = Seq("n_a_exact", "n_b_exact", "n_union_exact", "n_inter_exact",
      "k_a", "k_b", "k_m", "i_m")
    val dblCols = Seq("tau_a", "tau_b", "tau_m")
    def pad(s: DataFrame): DataFrame = s.select(
      (longCols ++ dblCols).map { c =>
        if (s.columns.contains(c)) col(c).as(c)
        else lit(null).cast(if (dblCols.contains(c)) "double" else "long").as(c)
      }: _*)
    val all = pad(exact).union(pad(sketchAgg(ka, "k_a", "tau_a")))
      .union(pad(sketchAgg(kb, "k_b", "tau_b")))
      .union(pad(sketchAgg(m, "k_m", "tau_m")))
      .union(pad(im))
      .agg(max("n_a_exact").as("n_a_exact"), max("n_b_exact").as("n_b_exact"),
        max("n_union_exact").as("n_union_exact"), max("n_inter_exact").as("n_inter_exact"),
        max("k_a").as("k_a"), max("k_b").as("k_b"), max("k_m").as("k_m"),
        max("i_m").as("i_m"), max("tau_a").as("tau_a"), max("tau_b").as("tau_b"),
        max("tau_m").as("tau_m"))
    def est(nExact: Column, tau: Column): Column =
      when(nExact < k, nExact.cast("double"))
        .otherwise(round(lit((k - 1).toDouble) / tau, 4))
    val estUnionE4 = when(col("n_union_exact") < k, col("n_union_exact") * 10000L)
      .otherwise(round(round(lit((k - 1).toDouble) / col("tau_m"), 4) * 10000d).cast("long"))
    val estInter = when(col("k_m") === 0, lit(0d))
      .otherwise(call_function("div", estUnionE4 * col("i_m"), col("k_m"))
        .cast("double") / 10000d)
    all.select(
      col("n_a_exact"), col("n_b_exact"), col("n_union_exact"), col("n_inter_exact"),
      est(col("n_a_exact"), col("tau_a")).as("est_a"),
      est(col("n_b_exact"), col("tau_b")).as("est_b"),
      est(col("n_union_exact"), col("tau_m")).as("est_union"),
      estInter.as("est_inter"))
  }

  /** DuckDB SQL reproducing `kmvDistinct` bit-for-bit over a table. */
  def kmvDistinctOracle(table: String, groupCol: String, valueCol: String,
                        k: Int = 64): String =
    s"""WITH d AS (SELECT DISTINCT $groupCol, $valueCol,
       |        ('0x'||substr(md5($valueCol::VARCHAR),1,15))::BIGINT
       |          / 1152921504606846976.0 AS h
       |      FROM $table WHERE $valueCol IS NOT NULL),
       |r AS (SELECT $groupCol, $valueCol, h,
       |        ROW_NUMBER() OVER (PARTITION BY $groupCol ORDER BY h, $valueCol) AS rnk,
       |        COUNT(*) OVER (PARTITION BY $groupCol) AS n_exact
       |      FROM d)
       |SELECT $groupCol, n_exact,
       |  CASE WHEN n_exact < $k THEN CAST(n_exact AS DOUBLE)
       |       ELSE ROUND(${(k - 1).toDouble} / h, 4) END AS est
       |FROM r WHERE rnk = LEAST($k, n_exact)
       |ORDER BY $groupCol""".stripMargin

  // ------------------------------------------------------------ count-min

  /** Count-min cell index of `item` for hash row `d`: first 8 md5 hex
    * chars of `"d:item"` mod `width` — the same engine-reproducible
    * md5-hash-family trick as the portable MinHash/KMV tiers. */
  def cmCell(item: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$d:"), item)), 1, 8), 16, 10)
      .cast("long") % width

  /** Count-min sketch (Cormode & Muthukrishnan 2005) built RELATIONALLY:
    * one row per (hash row, cell) with the summed count — `depth × width`
    * rows of state total, regardless of item cardinality. The groupBy is
    * partially aggregable, which IS the sketch's mergeability: map-side
    * partial cells are per-partition sketches and the shuffle merges them
    * by addition. Estimates (min over rows of the item's cell counts) are
    * biased high, never low — `est >= exact` always. */
  def countMinCells(items: DataFrame, itemCol: String,
                    width: Int, depth: Int): DataFrame =
    items.select(posexplode(
        array((0 until depth).map(d => cmCell(col(itemCol), d, width)): _*))
        .as(Seq("d", "cell")))
      .groupBy("d", "cell").agg(count(lit(1)).as("cnt"))

  /** Count-min estimate vs exact count for every distinct item, the top-k
    * by estimate. Candidates here are all distinct items (the vocabulary
    * is small next to the corpus); at production scale the sketch answers
    * point queries for SUSPECTED heavy hitters without rebuilding —
    * exactly what the fixed-size cell table is for. */
  def countMinTopK(items: DataFrame, itemCol: String, width: Int, depth: Int,
                   k: Int): DataFrame = {
    val cells = countMinCells(items, itemCol, width, depth)
    val cand = items.groupBy(itemCol).agg(count(lit(1)).as("exact"))
    val lookups = cand.select(col(itemCol), col("exact"), posexplode(
        array((0 until depth).map(d => cmCell(col(itemCol), d, width)): _*))
        .as(Seq("d", "cell")))
    lookups.join(broadcast(cells), Seq("d", "cell")) // cells ≤ depth×width rows
      .groupBy(col(itemCol), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col(itemCol), col("exact"), col("est"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(col("est").desc, col(itemCol).asc)
      .limit(k)
  }

  /** DuckDB SQL reproducing `countMinTopK` bit-for-bit (`itemsSql` must
    * yield one row per item occurrence in a column named `item`). */
  def countMinTopKOracle(itemsSql: String, width: Int, depth: Int,
                         k: Int): String =
    s"""WITH tok AS ($itemsSql),
       |dd AS (SELECT unnest(range($depth)) AS d),
       |cells AS (SELECT d, ('0x'||substr(md5(CAST(d AS VARCHAR)||':'||item),1,8))::BIGINT % $width AS cell,
       |            CAST(COUNT(*) AS BIGINT) AS cnt
       |          FROM tok CROSS JOIN dd GROUP BY 1, 2),
       |cand AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS exact FROM tok GROUP BY 1),
       |est AS (SELECT item, exact, MIN(cnt) AS est
       |        FROM cand CROSS JOIN dd
       |        JOIN cells ON cells.d = dd.d
       |          AND cells.cell = ('0x'||substr(md5(CAST(dd.d AS VARCHAR)||':'||item),1,8))::BIGINT % $width
       |        GROUP BY 1, 2)
       |SELECT item, exact, est, est - exact AS overcount
       |FROM est ORDER BY est DESC, item LIMIT $k""".stripMargin

  // --------------------------------------------------------- bloom filter

  /** Bloom bit position of `v` for hash function `t` (0-based): the t-th
    * 8-hex-char chunk of md5 mod `m` — the same engine-reproducible md5
    * hash family as the KMV/count-min tiers. j <= 4 (md5 yields 32 hex). */
  def bloomPos(v: Column, t: Int, m: Int): Column =
    conv(substring(md5(v.cast("string")), t * 8 + 1, 8), 16, 10)
      .cast("long") % m

  /** Bloom filter (Bloom 1970) built RELATIONALLY: the set-bit positions
    * as DISTINCT rows — at most `m` rows of state regardless of build-side
    * cardinality, and the distinct IS the sketch's idempotent OR-merge
    * (map-side partials union bit-sets per partition). This row form is
    * what the DuckDB oracle checks; [[BloomAgg]] is the packed-bitmap
    * production twin (one m/64-long array, bitwise-OR merge — what Spark's
    * own `InjectRuntimeFilter` builds internally for runtime join pruning).
    */
  def bloomBits(build: DataFrame, keyCol: String, m: Int, j: Int): DataFrame = {
    require(j >= 1 && j <= 4, "md5 yields 32 hex chars => at most 4 chunks")
    build.filter(col(keyCol).isNotNull)
      .select(explode(array((0 until j).map(t => bloomPos(col(keyCol), t, m)): _*))
        .as("pos"))
      .distinct()
  }

  /** Membership report: every probe key against the bits of the build
    * side, alongside exact membership. `in_bloom` has NO false negatives
    * by construction (asserted in SketchSpec); `is_fp` rows quantify the
    * (1-e^(-jn/m))^j false-positive trade. Output: probeKey, in_bloom,
    * in_build, is_fp.
    *
    * Scale shape: the bit set is <= m rows (broadcast), the probe side
    * explodes to j rows per key and aggregates back partially — the exact
    * pre-shuffle pruning shape: at 100 TB the probe filter
    * `in_bloom` drops non-joining rows BEFORE the expensive shuffle join,
    * with the build scan reduced to one m-bit broadcast. The exact
    * `in_build` column (a broadcast left join here) exists only for the
    * report's FP accounting — production pruning needs no exact side. */
  def bloomMembership(build: DataFrame, buildKey: String,
                      probe: DataFrame, probeKey: String,
                      m: Int = 1024, j: Int = 3): DataFrame = {
    val bits = bloomBits(build, buildKey, m, j).withColumn("hit", lit(1))
    val buildSet = build.filter(col(buildKey).isNotNull)
      .select(col(buildKey).as(probeKey)).distinct().withColumn("ex", lit(1))
    probe.filter(col(probeKey).isNotNull)
      .select(col(probeKey),
        explode(array((0 until j).map(t => bloomPos(col(probeKey), t, m)): _*))
          .as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_outer")
      .groupBy(probeKey)
      // a key whose j positions collide still probes j rows, so == j is
      // exact membership-of-all-positions even under within-key collisions
      .agg((count(when(col("hit") === 1, 1)) === j).as("in_bloom"))
      .join(broadcast(buildSet), Seq(probeKey), "left_outer")
      .withColumn("in_build", col("ex") === 1)
      .select(col(probeKey), col("in_bloom"),
        coalesce(col("in_build"), lit(false)).as("in_build"),
        (col("in_bloom") && coalesce(col("in_build"), lit(false)) === false)
          .as("is_fp"))
  }

  /** DuckDB SQL reproducing `bloomMembership` bit-for-bit. `buildSql` /
    * `probeSql` must yield one column named `k`. */
  def bloomMembershipOracle(buildSql: String, probeSql: String, outKey: String,
                            m: Int = 1024, j: Int = 3): String =
    s"""WITH build AS ($buildSql),
       |probe AS ($probeSql),
       |tt AS (SELECT unnest(range($j)) AS t),
       |bits AS (SELECT DISTINCT ('0x'||substr(md5(k::VARCHAR), t*8+1, 8))::BIGINT % $m AS pos
       |         FROM build CROSS JOIN tt WHERE k IS NOT NULL),
       |pp AS (SELECT k, ('0x'||substr(md5(k::VARCHAR), t*8+1, 8))::BIGINT % $m AS pos
       |       FROM probe CROSS JOIN tt WHERE k IS NOT NULL),
       |hits AS (SELECT pp.k, COUNT(bits.pos) = $j AS in_bloom
       |         FROM pp LEFT JOIN bits USING (pos) GROUP BY pp.k),
       |ex AS (SELECT DISTINCT k FROM build WHERE k IS NOT NULL)
       |SELECT hits.k AS $outKey, in_bloom,
       |  ex.k IS NOT NULL AS in_build,
       |  in_bloom AND ex.k IS NULL AS is_fp
       |FROM hits LEFT JOIN ex ON hits.k = ex.k
       |ORDER BY $outKey""".stripMargin

  /** The packed-bitmap Bloom as a typed `Aggregator` — the PRODUCTION
    * form: input is the key rendered to its hash string, buffer is the
    * m-bit filter as m/64 longs, merge is bitwise OR (one fixed-size array
    * per partition crosses the wire, never the keys). Membership of key k
    * = all j bits set. Spec-proven to produce identical verdicts to the
    * relational [[bloomMembership]] path. */
  final class BloomAgg(m: Int, j: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Array[Long]] {
    require(m % 64 == 0 && m > 0, "m must be a positive multiple of 64")
    require(j >= 1 && j <= 4, "md5 yields 32 hex chars => at most 4 chunks")
    override def zero: Array[Long] = new Array[Long](m / 64)

    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      var t = 0
      while (t < j) {
        val pos = BloomAgg.position(key, t, m)
        buf(pos >> 6) |= (1L << (pos & 63))
        t += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object BloomAgg {
    /** JVM twin of [[bloomPos]]: t-th 8-hex chunk of md5(key) mod m. */
    def position(key: String, t: Int, m: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      // hex chars [t*8, t*8+8) = bytes [t*4, t*4+4), big-endian unsigned
      var v = 0L
      var i = t * 4
      while (i < t * 4 + 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      (v % m).toInt
    }

    def contains(bits: Array[Long], key: String, j: Int, m: Int): Boolean =
      (0 until j).forall { t =>
        val pos = position(key, t, m)
        (bits(pos >> 6) & (1L << (pos & 63))) != 0
      }
  }

  // ---------------------------------------------------------- HyperLogLog

  /** HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) with m = 32
    * registers over the portable 60-bit md5 hash: register = top 5 hash
    * bits, rho = leading-zero rank of the remaining 55 bits (capped at 32
    * so the scaled harmonic sum stays in exact BIGINT range). The whole
    * estimate — harmonic mean in 2^32-scaled integer units, alpha_32
    * bias correction in micro-units, and the small-range linear-counting
    * switch (raw <= 2.5m with empty registers, the paper's rule) — is
    * integer or 6-dp-rounded-ln arithmetic, so DuckDB reproduces it
    * bit-for-bit and the tier gets a FULL oracle (the same reason the KMV
    * tier exists next to `approx_count_distinct`).
    *
    * Scale shape: rho extraction is pure codegen projection; the register
    * table is a PARTIALLY AGGREGABLE groupBy (state <= m rows per group
    * crosses the shuffle, map-side combined), folded to one row per group.
    * The exact count joins in only because the oracle compares both —
    * production uses [[HllAgg]], whose fixed m-int buffer is the only
    * per-partition state.
    *
    * Output: groupCol, n_exact, est, within_3sigma. */
  val HllB = 5
  val HllM = 32                    // 2^HllB
  val HllRhoCap = 32
  val HllAlphaMicro = 697000L      // alpha_32 = 0.697 (Flajolet 2007, Fig. 3)

  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val remMod = 1L << (60 - HllB)                // low 55 bits
    val h = portableUnitHashLong(col(valueCol))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol),
        call_function("div", h, lit(remMod)).as("j"), (h % remMod).as("rem"))
      .withColumn("rho",
        when(col("rem") === 0L, lit(HllRhoCap))
          .otherwise(least(lit(HllRhoCap),
            lit(60 - HllB + 1) - length(ltrim(bin(col("rem")), "0")))))
    val regs = base.groupBy(col(groupCol), col("j"))
      .agg(max("rho").as("m_j"))
    val est = regs.groupBy(col(groupCol)).agg(
        sum(call_function("shiftleft", lit(1L), lit(HllRhoCap) - col("m_j")))
          .as("s_present"),
        count(lit(1)).as("n_present"))
      .withColumn("s_scaled",
        col("s_present") + (lit(HllM.toLong) - col("n_present")) * lit(1L << HllRhoCap))
      .withColumn("v_zero", lit(HllM.toLong) - col("n_present"))
      .withColumn("raw_micro",
        call_function("div", lit(HllAlphaMicro * (1L << HllRhoCap)), col("s_scaled")) *
          lit(HllM.toLong * HllM))
      .withColumn("est_micro",
        when(col("raw_micro") <= lit(5L * HllM * 1000000L / 2) && col("v_zero") > 0,
          lit(HllM.toLong) *
            round(round(log(lit(HllM.toDouble) / col("v_zero")), 6) * 1000000d)
              .cast("long"))
          .otherwise(col("raw_micro")))
    val exact = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol)).agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.join(est, groupCol)
      .select(col(groupCol), col("n_exact"),
        (col("est_micro").cast("double") / 1000000d).as("est"),
        // 3 sigma = 3 * 1.04 / sqrt(32) = 55.2% relative, +2 absolute slack
        (abs(col("est_micro") - col("n_exact") * 1000000L) <=
          lit(552000L) * col("n_exact") + lit(2000000L)).as("within_3sigma"))
  }

  /** DuckDB twin of [[hllDistinct]] — identical integer pipeline. */
  def hllDistinctOracle(table: String, groupCol: String, valueCol: String): String = {
    val remMod = 1L << (60 - HllB)
    s"""WITH v AS (SELECT $groupCol,
       |        ('0x'||substr(md5($valueCol::VARCHAR),1,15))::BIGINT AS h
       |      FROM $table WHERE $valueCol IS NOT NULL),
       |r AS (SELECT $groupCol, h // $remMod AS j, h % $remMod AS rem FROM v),
       |rho AS (SELECT $groupCol, j,
       |        CASE WHEN rem = 0 THEN $HllRhoCap
       |             ELSE LEAST($HllRhoCap,
       |                        ${60 - HllB + 1} - LENGTH(LTRIM(bin(rem), '0')))
       |        END AS rho
       |      FROM r),
       |regs AS (SELECT $groupCol, j, MAX(rho) AS m_j FROM rho GROUP BY $groupCol, j),
       |agg AS (SELECT $groupCol,
       |        SUM(CAST(1 AS BIGINT) << ($HllRhoCap - m_j))
       |          + ($HllM - COUNT(*)) * (CAST(1 AS BIGINT) << $HllRhoCap) AS s_scaled,
       |        $HllM - COUNT(*) AS v_zero
       |      FROM regs GROUP BY $groupCol),
       |est AS (SELECT $groupCol, v_zero,
       |        (${HllAlphaMicro * (1L << HllRhoCap)} // s_scaled) * ${HllM.toLong * HllM}
       |          AS raw_micro
       |      FROM agg),
       |em AS (SELECT $groupCol,
       |        CASE WHEN raw_micro <= ${5L * HllM * 1000000L / 2} AND v_zero > 0
       |             THEN $HllM * CAST(ROUND(ROUND(LN(${HllM.toDouble} / v_zero), 6)
       |                                    * 1000000) AS BIGINT)
       |             ELSE raw_micro END AS est_micro
       |      FROM est),
       |ex AS (SELECT $groupCol, CAST(COUNT(DISTINCT $valueCol) AS BIGINT) AS n_exact
       |      FROM $table WHERE $valueCol IS NOT NULL GROUP BY $groupCol)
       |SELECT ex.$groupCol, ex.n_exact,
       |  CAST(em.est_micro AS DOUBLE) / 1000000.0 AS est,
       |  ABS(em.est_micro - ex.n_exact * 1000000) <= 552000 * ex.n_exact + 2000000
       |    AS within_3sigma
       |FROM ex JOIN em ON ex.$groupCol = em.$groupCol
       |ORDER BY ex.$groupCol""".stripMargin
  }

  /** The same HLL as a typed `Aggregator` — the PRODUCTION form: buffer is
    * the fixed m-int register array (elementwise-max merge; the ONLY state
    * that ever crosses a partition boundary), input is the raw 60-bit
    * portable hash. `finish` reproduces [[hllDistinct]]'s integer estimate
    * exactly (same div/shift/6-dp-ln arithmetic), which the spec asserts. */
  final class HllAgg
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Int], Double] {
    override def zero: Array[Int] = new Array[Int](HllM)

    override def reduce(buf: Array[Int], h: Long): Array[Int] = {
      val j = (h >>> (60 - HllB)).toInt
      val rem = h & ((1L << (60 - HllB)) - 1)
      // LENGTH(bin(rem)) = 64 - nlz(rem); rho = 56 - that = nlz - 8
      val rho =
        if (rem == 0L) HllRhoCap
        else math.min(HllRhoCap, java.lang.Long.numberOfLeadingZeros(rem) - 8)
      if (rho > buf(j)) buf(j) = rho
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Int]): Double = {
      var s = 0L; var vZero = 0L; var i = 0
      while (i < HllM) {
        s += 1L << (HllRhoCap - buf(i))
        if (buf(i) == 0) vZero += 1
        i += 1
      }
      val rawMicro = (HllAlphaMicro * (1L << HllRhoCap)) / s * (HllM.toLong * HllM)
      val estMicro =
        if (rawMicro <= 5L * HllM * 1000000L / 2 && vZero > 0) {
          val ln6 = java.math.BigDecimal.valueOf(math.log(HllM.toDouble / vZero))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          HllM * math.round(ln6 * 1000000d)
        } else rawMicro
      estMicro.toDouble / 1000000d
    }

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  // --------------------------------------- HDR-histogram quantile sketch

  /** Per-group quantile estimates from a log-bucketed integer histogram —
    * the HdrHistogram / DDSketch production shape (Tene, HdrHistogram;
    * Masson et al. 2019, "DDSketch"), in the fully-deterministic integer
    * form both engines reproduce bit-for-bit: a positive measure `v`
    * (exact integer units, e.g. cents) lands in the bucket whose lower
    * bound keeps the top `m+1` significant bits,
    *
    *   e  = max(bitlen(v) − (m+1), 0),   lb = (v >> e) << e,
    *
    * so bucket widths double per octave and every estimate's relative
    * error is < 2^-m. The quantile-q estimate is the lower bound of the
    * bucket holding the rank-⌈q·n⌉ value (ranks in exact integer
    * arithmetic — no floating-point quantile interpolation to diverge on).
    *
    * Unlike `approx_percentile` (Greenwald-Khanna, engine-internal state,
    * q_percentile_approx's bound-check-only oracle), the sketch HERE is
    * the value: bucket counts are a plain `groupBy(group, lb).count` —
    * partially aggregable (map-side combine), mergeable across shards /
    * stream batches by addition, and bounded at ≤ 64−m octaves × 2^m
    * sub-buckets per group regardless of data volume. At 100 TB the
    * shuffle carries one row per occupied bucket, not per value; the
    * cumulative/rank step windows over that bounded bucket table only.
    *
    * @param cents positive exact-integer measure (caller routes doubles
    *              through [[Exact.dec]] × scale first)
    * @param quantiles (numerator, denominator) pairs, e.g. (1,2) = p50 */
  def hdrQuantiles(df: DataFrame, groupCol: String, cents: Column, m: Int,
                   quantiles: Seq[(Int, Int)]): DataFrame = {
    val buckets = df.groupBy(col(groupCol), hdrBucketLb(cents, m).as("lb"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy("lb")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    val cum = buckets
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(wAll))
    val qCols = quantiles.map { case (qn, qd) =>
      val rank = call_function("div", col("n") * qn + (qd - 1), lit(qd.toLong))
      min(when(col("cum") >= rank, col("lb"))).as(s"p${qn * 100 / qd}_lb")
    }
    val aggs = max("n").as("n") +: qCols
    cum.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }

  /** The bucket lower bound `(v >> e) << e`, `e = max(bitlen(v)−(m+1), 0)`
    * — the sketch's whole hashing step, shared by the batch quantiles and
    * the windowed streaming form ([[graft.streaming.StreamOps
    * .tumblingHdrBuckets]]). Codegen'd `bin`/shift built-ins only. */
  def hdrBucketLb(cents: Column, m: Int): Column = {
    require(m >= 1 && m <= 20, s"hdrBucketLb: m out of range: $m")
    val e = greatest(length(bin(cents)) - lit(m + 1), lit(0))
    call_function("shiftleft", call_function("shiftright", cents, e), e)
  }

  /** DuckDB SQL reproducing [[hdrQuantiles]] bit-for-bit. `centsSql` must
    * be the exact-integer twin of the Spark `cents` column. */
  def hdrQuantilesOracle(table: String, groupCol: String, centsSql: String,
                         m: Int, quantiles: Seq[(Int, Int)]): String = {
    val qSelects = quantiles.map { case (qn, qd) =>
      s"CAST(MIN(CASE WHEN cum >= (n * $qn + ${qd - 1}) // $qd THEN lb END) " +
        s"AS BIGINT) AS p${qn * 100 / qd}_lb"
    }.mkString(",\n  ")
    s"""WITH c AS (SELECT $groupCol, $centsSql AS v FROM $table),
       |b AS (SELECT $groupCol, (v >> e) << e AS lb, COUNT(*) AS cnt
       |      FROM (SELECT $groupCol, v,
       |              greatest(length(bin(v)) - ${m + 1}, 0) AS e FROM c)
       |      GROUP BY 1, 2),
       |w AS (SELECT $groupCol, lb, cnt,
       |        SUM(cnt) OVER (PARTITION BY $groupCol ORDER BY lb) AS cum,
       |        SUM(cnt) OVER (PARTITION BY $groupCol) AS n
       |      FROM b)
       |SELECT $groupCol, CAST(MAX(n) AS BIGINT) AS n,
       |  $qSelects
       |FROM w GROUP BY $groupCol ORDER BY $groupCol""".stripMargin
  }

  // ------------------------------------------------- Misra-Gries summary

  /** Heavy-hitter report from the native Misra–Gries summary
    * ([[graft.functions.MisraGries]]): every term whose exact frequency
    * exceeds n/(k+1) — all of which the MG guarantee forces into the
    * ≤ k-counter summary — with its exact count and the deterministic
    * bound check `est ≤ exact ∧ (exact − est)·(k+1) ≤ n` (exact integer
    * comparisons; the counter values themselves vary with partitioning,
    * the bounds never do — same reporting discipline as the KMV/HLL/GK
    * estimate-bounds queries).
    *
    * Scale shape: the summary is one partial-agg pass with ≤ k counters
    * per partition; exact counts are one partially-aggregable groupBy.
    * The scalar n RIDES the ≤ k exploded summary rows, so the report join
    * is exact ⋈ broadcast(est) on the term — never a constant-key product
    * join or a vocab-wide window. A missing heavy hitter (an MG bug)
    * would drop a row and fail the driver's row compare, so presence is
    * checked by the row set itself. */
  def mgHeavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    val summary = items.agg(
      graft.functions.MisraGries.mg(col(itemCol), k).as("mg"),
      count(lit(1)).cast("long").as("n"))
    val est = summary.select(col("n"), explode(col("mg")).as("e"))
      .select(col("n"), col("e.term").as("term"), col("e.est").as("est"))
    val exact = items.groupBy(col(itemCol).as("term"))
      .agg(count(lit(1)).cast("long").as("exact_c"))
    exact.join(broadcast(est), Seq("term"))
      .filter(col("exact_c") * (k + 1) > col("n"))
      .select(col("term"), col("exact_c"),
        (col("est") <= col("exact_c") &&
          (col("exact_c") - col("est")) * (k + 1) <= col("n")).as("within_bound"))
  }
}

package graft.sources

import org.apache.spark.sql.SparkSession

/** Fixture-schema preflight for the driver testdata.
  *
  * Round 6 lesson: the driver regenerated `events.parquet` with a different
  * physical timestamp encoding (TIMESTAMP(NANOS) → timestamp[us]) and the
  * drift surfaced as 25 scattered analysis failures instead of one named
  * error. This probe reads ONLY the parquet footers (no data scan) before a
  * Verify/Bench run and fails with one aggregated, named
  * `fixture schema changed: <table>.<col> is now <type>` error on any drift
  * the engine does not know how to absorb.
  *
  * Timestamp columns accept every encoding [[Tables.adaptEventTs]] can
  * normalize (INT64 nanos under `nanosAsLong`, TIMESTAMP_NTZ, TIMESTAMP) —
  * the preflight names what the loader cannot handle, it does not pin one
  * physical type (that rigidity was the round-6 defect).
  */
object Preflight {

  private val AnyTs = Set("bigint", "timestamp", "timestamp_ntz")

  /** Expected logical columns per table: name → accepted Spark
    * `DataType.simpleString` values. Extra columns in the fixture are
    * tolerated (additive drift is safe); missing or re-typed ones are not. */
  val Expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> AnyTs, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> AnyTs),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> AnyTs,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>", "array<double>"),
      "label" -> Set("int")))

  /** Probe every table's footer under `sfDir`; returns the list of drift
    * messages (empty = clean). The session must already carry
    * `nanosAsLong` (Verify/Bench/specs set it at construction) so a NANOS
    * events fixture is readable at all. */
  def probe(spark: SparkSession, sfDir: String): Seq[String] = {
    Expected.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      try {
        val s = spark.read.parquet(s"$sfDir/$t.parquet").schema
        val byName = s.fields.map(f => f.name -> f.dataType.simpleString).toMap
        cols.flatMap { case (c, ok) =>
          byName.get(c) match {
            case None =>
              Some(s"fixture schema changed: $t.$c is missing")
            case Some(tp) if !ok(tp) =>
              Some(s"fixture schema changed: $t.$c is now $tp " +
                s"(engine handles ${ok.toSeq.sorted.mkString("/")})")
            case _ => None
          }
        }
      } catch { case scala.util.control.NonFatal(e) =>
        Seq(s"fixture unreadable: $t.parquet (${e.getMessage})")
      }
    }
  }

  /** Throw ONE aggregated error naming every drift, or return silently. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val drifts = probe(spark, sfDir)
    if (drifts.nonEmpty)
      throw new IllegalStateException(
        (s"fixture preflight failed for $sfDir:" +: drifts).mkString("\n  "))
  }
}

package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic N× scale-up of a driver testdata directory — the tool
 * behind the sf1 scale-stress runs (VERDICT r6 item 1): replicate every
 * fact table `copies` times with disjoint key blocks so referential
 * integrity holds copy-locally and the scaled graph keeps the source's
 * shape (per-part/per-order fan-outs unchanged; the 25 nations/5 regions
 * stay shared, so their in-stars grow ×N like a real bigger tenant).
 *
 * Table rules:
 *  - region/nation: shared dimensions, copied once.
 *  - customer/supplier/part/orders/lineitem: key k → k + i·(max+1); all
 *    foreign keys shifted consistently within copy i.
 *  - events: event_id → id·N + i (INTERLEAVED, so transaction order
 *    stays aligned with event-time order — block offsets would make
 *    every copy after the first look back-dated and change the temporal
 *    workload's character); user_id → block offset.
 *  - documents: doc_id block offset; TEXT per-copy letter-rotated
 *    (translate a→d→g…, identity for copy 0) so copies share no tokens:
 *    cross-copy docs are NOT near-duplicates and the dedup/BM25 workload
 *    scales like an organic 10× corpus instead of a 10-clone corpus
 *    where every banded bucket holds N copies of everything.
 *  - embeddings: vec_id block offset, vectors as-is (cell populations
 *    scale ×N; duplicate vectors rank deterministically by id).
 */
object ScaleUp {

  def rot(s: String, by: Int): String = {
    val n = s.length
    (0 until n).map(i => s((i + by) % n)).mkString
  }

  def scaleTable(spark: SparkSession, src: String, name: String,
                 copies: Int): DataFrame = {
    val df = spark.read.parquet(s"$src/$name.parquet")
    // EVERY key's copy offset derives from its PK TABLE's max, never from
    // a referencing table's: an FK whose max referenced key carries no
    // rows in the referencing table (highest customer with no orders)
    // would otherwise shift by a smaller block and dangle in copies ≥ 1
    def pkBlock(table: String, key: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(key))).head().getLong(0) + 1L
    def block(key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    def shifted(keys: String*): DataFrame = {
      val offs = keys.map(k => k -> block(k)).toMap
      (0 until copies).map { i =>
        keys.foldLeft(df) { (d, k) => d.withColumn(k, col(k) + lit(i * offs(k))) }
      }.reduce(_ unionByName _)
    }
    name match {
      case "region" | "nation" => df
      case "customer" => shifted("c_custkey")
      case "supplier" => shifted("s_suppkey")
      case "part"     => shifted("p_partkey")
      case "orders" =>
        val oo = block("o_orderkey")
        val oc = pkBlock("customer", "c_custkey")
        (0 until copies).map(i => df
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * oo))
          .withColumn("o_custkey", col("o_custkey") + lit(i * oc)))
          .reduce(_ unionByName _)
      case "lineitem" =>
        val oo = pkBlock("orders", "o_orderkey")
        val op = pkBlock("part", "p_partkey")
        val os = pkBlock("supplier", "s_suppkey")
        (0 until copies).map(i => df
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * oo))
          .withColumn("l_partkey", col("l_partkey") + lit(i * op))
          .withColumn("l_suppkey", col("l_suppkey") + lit(i * os)))
          .reduce(_ unionByName _)
      case "events" =>
        val ou = block("user_id")
        (0 until copies).map(i => df
          .withColumn("event_id", col("event_id") * lit(copies.toLong) + lit(i.toLong))
          .withColumn("user_id", col("user_id") + lit(i * ou)))
          .reduce(_ unionByName _)
      case "documents" =>
        val od = block("doc_id")
        val lower = "abcdefghijklmnopqrstuvwxyz"
        val upper = lower.toUpperCase
        (0 until copies).map { i =>
          val by = (i * 3) % 26
          df.withColumn("doc_id", col("doc_id") + lit(i * od))
            .withColumn("text",
              translate(col("text"), lower + upper, rot(lower, by) + rot(upper, by)))
        }.reduce(_ unionByName _)
      case "embeddings" =>
        val ov = block("vec_id")
        (0 until copies).map(i =>
          df.withColumn("vec_id", col("vec_id") + lit(i * ov)))
          .reduce(_ unionByName _)
      case other =>
        throw new IllegalArgumentException(s"no scale rule for table $other")
    }
  }

  val Tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** args: srcDir dstDir copies */
  def main(args: Array[String]): Unit = {
    val Array(src, dst, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // back-compat: some driver rounds shipped events.ts as
      // TIMESTAMP(NANOS) (no-op for the current timestamp[us] layout)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.foreach { t =>
      val out = scaleTable(spark, src, t, copies)
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}

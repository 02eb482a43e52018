package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.util.ScaleUp

/** The N× scale-up must keep referential integrity copy-locally — in
  * particular when the highest-keyed PK row has NO referencing rows, the
  * FK's copy offset must come from the PK table, not from the FK column's
  * own max (the coincidence that hid this on the dense driver data). */
class ScaleUpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("FK blocks derive from PK tables: no dangling keys when the max customer has no orders") {
    import spark.implicits._
    val src = "/root/repo/target/tmp/scaleup_src"
    val dst = "/root/repo/target/tmp/scaleup_dst"
    // customers 0..9; customer 9 (the max) places NO orders
    (0L to 9L).map(c => (c, s"cust_$c")).toDF("c_custkey", "c_name")
      .write.mode("overwrite").parquet(s"$src/customer.parquet")
    // orders 0..4 by customers 0..4; order 4 (the max) has NO lineitems
    (0L to 4L).map(o => (o, o)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$src/orders.parquet")
    (0L to 3L).map(o => (o, o % 2, o % 2)).toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$src/lineitem.parquet")
    (0L to 1L).map(p => (p, s"part_$p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$src/part.parquet")
    (0L to 1L).map(s => (s, s"supp_$s")).toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$src/supplier.parquet")

    val copies = 3
    Seq("customer", "orders", "lineitem", "part", "supplier").foreach { t =>
      ScaleUp.scaleTable(spark, src, t, copies)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    def tbl(t: String) = spark.read.parquet(s"$dst/$t.parquet")
    // row counts scale exactly
    assert(tbl("customer").count() == 30 && tbl("orders").count() == 15 &&
      tbl("lineitem").count() == 12)
    // ZERO dangling FKs across all copies
    val danglingCust = tbl("orders").join(tbl("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(danglingCust == 0, s"$danglingCust orders point at missing customers")
    val danglingOrd = tbl("lineitem").join(tbl("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(danglingOrd == 0, s"$danglingOrd lineitems point at missing orders")
    val danglingPart = tbl("lineitem").join(tbl("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count()
    assert(danglingPart == 0, s"$danglingPart lineitems point at missing parts")
    // and keys stay copy-local: every copy's custkeys live in its block
    val blocks = tbl("orders")
      .select((col("o_custkey") / 10).cast("int").as("blk")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(blocks == Set(0, 1, 2))
  }

  test("letter rotation keeps copies token-disjoint; copy 0 is verbatim") {
    import spark.implicits._
    val src = "/root/repo/target/tmp/scaleup_src2"
    Seq((0L, "the quick brown fox", "en", "web", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val out = ScaleUp.scaleTable(spark, src, "documents", 3)
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "the quick brown fox")
    assert(out.distinct.length == 3, "copies share text — near-dup pollution")
    // same shape (token lengths), different tokens
    assert(out.forall(_.split(" ").map(_.length).toSeq == Seq(3, 5, 5, 3)))
  }
}

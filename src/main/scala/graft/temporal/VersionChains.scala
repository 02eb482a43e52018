package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.log.FactStore

/**
 * Set-oriented version-chain operators over a [[FactStore]] — the bulk
 * twin of the per-handle navigation in GraftGraph (SURVEY §2.6): one
 * windowed pass computes for EVERY element what the reference's
 * one-Datalog-query-per-step chain walk produces per element
 * (FluxUtil.java:169-217, FluxTimeIterable.java:10-107).
 *
 * All windows partition by element — the shuffle scales with elements,
 * never with total history length.
 */
object VersionChains {

  private def w = Window.partitionBy(col("e")).orderBy(col("tx"))

  /** (e, tx, prevTx, nextTx): every version of every element with its
    * chain neighbors (getPreviousVersion/getNextVersion set-at-a-time).
    * prevTx from the recorded touch row (the reified chain fact); nextTx
    * by lead. */
  def chains(store: FactStore): DataFrame =
    store.touchesDF
      .withColumn("nextTx", lead(col("tx"), 1).over(w))

  /** (e, tx, validFrom, validTo): the validity interval of each version —
    * [txInstant(this), txInstant(next)), open (null) for the head
    * (getTimeInterval, FluxElement.java:142-152). */
  def intervals(store: FactStore): DataFrame = {
    val txs = store.txsDF
    chains(store)
      .join(txs, "tx")
      .withColumn("validFrom", col("txInstant"))
      .withColumn("validTo", lead(col("txInstant"), 1).over(w))
      .select(col("e"), col("tx"), col("validFrom"), col("validTo"))
  }

  /** (e, timeId): current max tx per element over facts ∪ touches —
    * getTimeId for every element in one aggregation
    * (FluxUtil.java:196-217). */
  def timeIds(store: FactStore): DataFrame =
    store.factsDF.select(col("e"), col("tx"))
      .unionAll(store.touchesDF.select(col("e"), col("tx")))
      .groupBy(col("e")).agg(max(col("tx")).as("timeId"))

  /** Version count per element (length of each chain). */
  def versionCounts(store: FactStore): DataFrame =
    store.touchesDF.groupBy(col("e").as("id")).agg(count(lit(1)).as("n_versions"))
}

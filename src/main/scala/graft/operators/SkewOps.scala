package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (100 TB posture).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense — it splits oversized shuffle
  * partitions at runtime. These helpers cover the cases AQE can't fix:
  * a single hot KEY (AQE can split a partition, but every row of one key
  * still meets every matching row) and pre-AQE-stage aggregations.
  */
object SkewOps {

  /** Salted equi-join: the big side gets a deterministic per-row salt in
    * [0, salts); the small side is replicated `salts` times. A key holding
    * 10% of the big side then lands on `salts` reducers instead of one.
    * Result is exactly the plain inner join (salt is join-neutral).
    *
    * `saltSource` must be deterministic (task retries must re-derive the
    * same salt) — default hashes the whole row. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 saltSource: Option[Column] = None): DataFrame = {
    val saltCol = saltSource.getOrElse(hash(big.columns.map(col).toSeq: _*))
    val saltedBig = big.withColumn("__salt", pmod(saltCol, lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: aggregate on (keys, salt) first, merge
    * partials second (the q28 pattern as a reusable transform). `partials`
    * maps each output column to (phase1 agg, phase2 merge). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }
}

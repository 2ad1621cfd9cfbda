package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join splitting handles joins
  * at runtime; for aggregations over pathologically hot keys (one key
  * holding 1% of 100 TB lands on one reducer) the classic fix is
  * two-stage salted aggregation: spread each key over `salts`
  * sub-keys, partially aggregate, then combine. Correct for any
  * algebraic aggregate; this helper covers the count/sum family.
  */
object Skew {

  /** Two-stage salted grouped aggregation: stage 1 groups by
    * (key, salt) — hot keys fan out over `salts` reducers — stage 2
    * combines the partials per key. `aggs` maps output column name →
    * (stage1 aggregate of input, stage2 combiner of the partial).
    *
    * `saltCols` picks the columns hashed into the salt (default: the
    * full row). Pass it explicitly when
    *  - the hot key's rows are FULLY identical (key and value): a
    *    full-row hash maps them all to ONE salt and the mitigation
    *    silently does nothing — point `saltCols` at any stable
    *    per-row id (ingest offset, doc_id, file+rownum) to restore
    *    fan-out for the billions-of-identical-rows case;
    *  - the row contains map-typed columns, which `xxhash64` rejects.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                aggs: Map[String, (Column, String => Column)],
                saltCols: Seq[String] = Nil): DataFrame = {
    // DETERMINISTIC salt (hash of the salt columns), not
    // partition_id + monotonically_increasing_id: nondeterministic
    // salts are the SPARK-23207 failure class — a stage-1 shuffle
    // partition recomputed after executor loss re-salts its rows
    // differently from what other reducers already fetched, silently
    // double-counting/dropping rows. Hashing key+value still fans a
    // hot key across salts whenever its values vary (the common skew
    // case); identical duplicates sharing a salt only costs spread,
    // never correctness — see `saltCols` above for that corner.
    val sc = if (saltCols.nonEmpty) saltCols else df.columns.toSeq
    val salted = df.withColumn("_salt",
      pmod(xxhash64(sc.map(col): _*), lit(salts.toLong)))
    val stage1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(aggs.head._2._1.as("_" + aggs.head._1),
        aggs.tail.map { case (n, (a, _)) => a.as("_" + n) }.toSeq: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2("_" + aggs.head._1).as(aggs.head._1),
        aggs.tail.map { case (n, (_, c)) => c("_" + n).as(n) }.toSeq: _*)
  }

  /** Salted count+sum per key — the common case. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16, saltCols: Seq[String] = Nil): DataFrame =
    saltedAgg(df, keys, salts, scala.collection.immutable.ListMap(
      "n" -> (count(lit(1)), (c: String) => sum(col(c))),
      "total" -> (sum(col(valueCol)), (c: String) => sum(col(c)))),
      saltCols)
}

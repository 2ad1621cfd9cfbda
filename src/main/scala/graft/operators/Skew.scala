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

  /** Salted-replicate equi-join for skewed FACT keys: the fact side
    * gets a deterministic salt in [0, salts), the dim side is
    * replicated once per salt value, and the join runs on
    * (keys, _salt) — a hot fact key that would land C(hot) rows on
    * ONE reducer now spreads over `salts` reducers, each matching its
    * replica of the dim row. The salt never escapes: the result is
    * exactly the plain `fact ⋈ dim` row multiset.
    *
    * This is the complement to AQE's skew-join splitting for the case
    * AQE handles poorly: a MID-SIZE dim (too big to broadcast, so the
    * join must shuffle) against one pathologically hot fact key — AQE
    * can split the fact side's oversized partition, but every split
    * still has to co-locate with the SAME dim partition, which it
    * must replicate at runtime per split; pre-salting makes the
    * replication explicit, deterministic, and planned.
    *
    * Costs and contracts:
    *  - dim is scanned once and exploded ×`salts` — size the salt
    *    count to hot-key spread, not to cores (16 replicas of a 1 GB
    *    dim is 16 GB of shuffle, the price of unsticking the reducer);
    *  - the salt hashes the fact's `saltCols` (default: full row) —
    *    deterministic, so a recomputed stage re-salts identically
    *    (same SPARK-23207 reasoning as [[saltedAgg]]);
    *  - INNER equi-join on `keys` only (the semantics the salt
    *    preserves trivially; outer variants would need unmatched-row
    *    bookkeeping per replica). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val sc = if (saltCols.nonEmpty) saltCols else fact.columns.toSeq
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(sc.map(col): _*), lit(salts.toLong)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Salted count+sum per key — the common case. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16, saltCols: Seq[String] = Nil): DataFrame =
    saltedAgg(df, keys, salts, scala.collection.immutable.ListMap(
      "n" -> (count(lit(1)), (c: String) => sum(col(c))),
      "total" -> (sum(col(valueCol)), (c: String) => sum(col(c)))),
      saltCols)
}

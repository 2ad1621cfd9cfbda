package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count–min sketch: fixed d×w counter grid estimating any item's
  * frequency with one-sided error (est ≥ exact, excess bounded by
  * N/w per row, min over d rows). The point at corpus scale: the
  * sketch answers frequency queries WITHOUT a vocabulary — the
  * counter grid is d·w cells regardless of how many distinct items
  * exist, where an exact per-item count table is vocabulary-sized.
  * Complements [[HeavyHitters]] (exact top items, no tail) — CMS
  * serves the tail too, approximately.
  *
  * Determinism: bucket hashes are the md5-h15 scheme
  * ([[Dedup.md5Wid]] convention) — a pure function of (row, item), so
  * the full sketch, and therefore every estimate, is bit-replayable
  * by the DuckDB oracle. Build = one narrow d-way explode + one
  * grouped count onto d·w cells; estimates join items against the
  * tiny counter table (broadcast).
  */
object Sketches {

  /** Bucket of `item` in sketch row `r`: h15("cms<r>:" || item) % w. */
  def cmsBucket(item: Column, r: Int, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"cms$r:"), item).cast("binary")),
      1, 15), 16, 10).cast("long"), lit(w.toLong))

  /** DuckDB twin of [[cmsBucket]]. */
  def cmsBucketSql(expr: String, r: Int, w: Int): String = {
    val h = s"""list_reduce(list_transform(
       |      string_split(substr(md5('cms$r:' || $expr), 1, 15), ''),
       |      c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1),
       |      (a, b) -> a * 16 + b)""".stripMargin
    s"($h % $w)"
  }

  /** The d×w counter grid from an item column: (r, bucket, cnt). */
  def cmsCounters(items: DataFrame, itemCol: String,
                  d: Int, w: Int): DataFrame = {
    val rows = (0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket")))
    items.select(explode(array(rows: _*)).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries` (one item per row): min over the d
    * row counters. The counter grid broadcasts — d·w cells. */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, itemCol: String,
                  d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(r =>
      struct(lit(r).as("r"), cmsBucket(col(itemCol), r, w).as("bucket")))
    queries.select(col(itemCol), explode(array(cells: _*)).as("cell"))
      .select(col(itemCol), col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .join(broadcast(counters), Seq("r", "bucket"))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("est"))
  }

  // --------------------------------------------- K-minimum-values
  /** KMV distinct sketch — the DETERMINISTIC, cross-engine-checkable
    * sibling of HyperLogLog (`q_approx_distinct`'s
    * `approx_count_distinct`, whose register layout no other engine
    * can replay): hash every item with the seeded md5-h15 scheme
    * into [0, 2^60) and keep the k smallest DISTINCT hash values.
    * Uniform hashes ⇒ the k-th smallest m_k sits near k/n of the
    * range, so n̂ = (k-1)·2^60 / m_k (unbiased; rel. stderr
    * ≈ 1/√(k−2)). If fewer than k distinct hashes exist the sketch
    * IS the exact distinct set, so the estimate degrades to exact.
    *
    * Why it scales to 100 TB:
    *  - the sketch is k values, independent of corpus size; building
    *    it is a distinct + top-k, which Spark executes as per-
    *    partition partial top-k (TakeOrderedAndProject globally,
    *    WindowGroupLimit per group) — map-side-combining, one shuffle
    *    of at most k·partitions candidate values;
    *  - it is MERGEABLE: kmv(A ∪ B) = k-smallest(kmv(A) ∪ kmv(B)),
    *    an exact algebra (not approximate union), so per-shard / per-
    *    day sketches compose without touching the raw corpus —
    *    [[kmvMergeTwo]] is that identity as a plan, gated bit-exact
    *    against the one-shot sketch by `q_kmv_merge`.
    *
    * Estimate determinism: (k-1)·2^60 is precomputed in Scala and
    * embedded as one double literal in BOTH engines; m_k → double is
    * IEEE nearest in both; one divide + floor is IEEE-identical, so
    * the DuckDB twin hash-matches bit-for-bit. */
  val KmvSeed: Long = 7042L

  /** 60-bit seeded hash of `item` (the [[Dedup.md5Wid]] scheme minus
    * the mod-P fold: KMV needs the full uniform range). */
  def kmvHash(item: Column, seed: Long = KmvSeed): Column =
    conv(substring(md5(concat(lit(s"$seed:"), item.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** DuckDB twin of [[kmvHash]]. */
  def kmvHashSql(expr: String, seed: Long = KmvSeed): String =
    graft.operators.Scorers.ProxyBackend.h15Sql(seed, expr)

  /** (k-1)·2^60 as the shared estimate numerator: one literal, both
    * engines (Scala's Double.toString round-trips, and DuckDB parses
    * it to the identical IEEE value). */
  def kmvNumerator(k: Int): Double = (k - 1).toDouble * 1152921504606846976.0

  /** The global sketch: k smallest distinct hashes of `itemCol`.
    * `distinct` is the one corpus-shaped shuffle; the top-k compiles
    * to TakeOrderedAndProject (per-partition partial top-k, k-sized
    * driver merge — never a global sort). */
  def kmvSketch(items: DataFrame, itemCol: String, k: Int,
                seed: Long = KmvSeed): DataFrame =
    items.select(kmvHash(col(itemCol), seed).as("hv"))
      .distinct().orderBy(col("hv")).limit(k)

  /** Exact merge algebra: the k smallest of the union of two
    * sketches' values. Inputs are ≤ k rows each, so this is
    * sketch-sized work regardless of what corpora they summarize. */
  def kmvMergeTwo(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).distinct().orderBy(col("hv")).limit(k)

  /** One-row estimate from a sketch: (k_got, kth_min, est_distinct).
    * k_got < k ⇒ the sketch saw every distinct hash ⇒ exact. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("k_got"), max(col("hv")).as("kth_min"))
      .select(col("k_got"), col("kth_min"),
        when(col("k_got") < k, col("k_got"))
          .otherwise(floor(lit(kmvNumerator(k)) / col("kth_min").cast("double"))
            .cast("long"))
          .as("est_distinct"))

  /** Per-group KMV: one k-value sketch per group in a single pass.
    * The rank filter is a grouped top-k — Spark 4 plans it as
    * WindowGroupLimit (per-partition partial top-k BEFORE the
    * exchange, asserted by KmvSpec), so a group's candidate set
    * entering the shuffle is k per input partition, not the group's
    * full distinct-hash census. */
  def kmvPerGroup(items: DataFrame, grpCol: String, itemCol: String,
                  k: Int, seed: Long = KmvSeed): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hv = items
      .select(col(grpCol), kmvHash(col(itemCol), seed).as("hv"))
      .distinct()
    val w = Window.partitionBy(col(grpCol)).orderBy(col("hv"))
    hv.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("k_got"), max(col("hv")).as("kth_min"))
      .select(col(grpCol), col("k_got"), col("kth_min"),
        when(col("k_got") < k, col("k_got"))
          .otherwise(floor(lit(kmvNumerator(k)) / col("kth_min").cast("double"))
            .cast("long"))
          .as("est_distinct"))
  }

  /** [[KmvAgg]] as a Column aggregate over a 60-bit hash column. */
  def kmvAggCol(hv: Column, k: Int): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hv)

  /** Sketch → (k_got, kth_min, est_distinct) columns, the same
    * estimate expression as [[kmvEstimate]] but over a buffer array
    * (ascending ⇒ the last element IS the k-th smallest). */
  def kmvEstimateFromBuffer(sketch: Column, k: Int): Seq[Column] = {
    val kGot = size(sketch).cast("long")
    // Zero-input degradation: element_at(arr, -1) on an empty sketch
    // ERRORS under Spark 4's default ANSI mode — guard it so a query
    // over an empty stream emits (k_got=0, kth_min=0, est=0) instead
    // of failing. The kth_min>0 guard likewise keeps a (probability
    // 2^-60) zero hash from dividing by zero in the estimator branch.
    val kthMin = when(kGot > lit(0L), element_at(sketch, -1)).otherwise(lit(0L))
    Seq(kGot.as("k_got"), kthMin.as("kth_min"),
      when(kGot < k, kGot) // covers k_got = 0 → est 0 (exact branch)
        .otherwise(when(kthMin > lit(0L),
            floor(lit(kmvNumerator(k)) / kthMin.cast("double")).cast("long"))
          .otherwise(lit(0L)))
        .as("est_distinct"))
  }
}

/** The KMV sketch AS a typed algebraic aggregate: the buffer is the
  * sketch itself — an ascending, duplicate-free array of at most k
  * hash values. `reduce` is a binary-search insert capped at k;
  * `merge` is [[Sketches.kmvMergeTwo]]'s algebra on two arrays (the
  * sketch is a proper commutative monoid, so partial aggregation,
  * any merge-tree shape, AND streaming state-store accumulation all
  * yield the identical sketch). This is what makes the distinct
  * estimate maintainable incrementally: Structured Streaming keeps
  * one ≤k-value buffer in the state store and folds each microbatch
  * in — `q_stream_kmv` gates that the streamed sketch equals the
  * batch replay bit-for-bit, estimate included. */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], hv: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, hv)
    if (i >= 0) buf // already in the sketch
    else {
      val ins = -i - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = hv
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) { // hv beats the current k-th minimum
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = hv
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // two-pointer merge of sorted duplicate-free arrays, capped at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) { if (j < b.length && b(j) == v) j += 1; i += 1 }
      else j += 1
      out(n) = v; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

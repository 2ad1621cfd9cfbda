package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Dedup, Selection, Similarity}

/** North-star extensions (BASELINE.json): the large-scale
  * training-data-pipeline operators the reference lacks —
  * deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard),
  * similarity search (brute-force / LSH / IVF), and text analysis
  * (language ID, quality, token counts, fingerprints).
  *
  * Oracle-parity notes: shingle ids are seeded md5-h15 hashes
  * ([[Dedup.md5Wid]]), which DuckDB replays digit-for-digit
  * ([[Dedup.widSql]]) — no vocabulary, no global rank, and the
  * scalable exact-collapse→near-dup composition gates oracle-exact
  * with the very same ids it would use at 100 TB.
  */
object NorthStarQueries extends QueryModule {

  private def docs(implicit s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def embs(implicit s: SparkSession, dir: String) = Tables.embeddings(s, dir)

  // ------------------------------------------------------- exact dedup
  /** Exact dedup over a normalized content key (40-char prefix — the
    * corpus's planted near-dups share it): duplicate groups with the
    * kept representative. */
  private def qDedupExact(implicit s: SparkSession, dir: String): DataFrame =
    Dedup.dupGroups(
        docs.withColumn("content_key", substring(col("text"), 1, 40)),
        "doc_id", Seq("content_key"))
      .orderBy(col("content_key"))

  private val qDedupExactSql =
    """SELECT substr(text, 1, 40) AS content_key, COUNT(*) AS n_dups,
      |  MIN(doc_id) AS keeper
      |FROM documents GROUP BY 1 HAVING COUNT(*) > 1
      |ORDER BY content_key""".stripMargin

  // ---------------------------------------------------- shingle plumbing
  /** Cached: every dedup query reads this 2–3 times (explode for
    * signatures/votes + twice for pair verification). Tracked so the
    * bench/verify drivers can release it between queries. */
  private def shingleSets(implicit s: SparkSession, dir: String): DataFrame =
    graft.core.Caches.track(docs.select(col("doc_id"),
      TextFns.shinglesDistinct(col("text"), 3).as("shset")))

  /** Shared SQL CTE prefix over a source relation `src(doc_id, text)`:
    * 3-gram shingle sets + doc→shingle-id rows, ids via the md5-h15
    * scheme ([[Dedup.widSql]]) — no vocabulary, no global rank. */
  private def shingleCtesFrom(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM $src),
       |sets AS (
       |  SELECT doc_id,
       |    list_distinct(CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
       |      ELSE list_transform(range(1, len(t) - 1),
       |             i -> array_to_string(list_slice(t, i, i + 2), ' ')) END) AS shset
       |  FROM toks),
       |docw AS (
       |  SELECT doc_id, ${Dedup.widSql("sh")} AS wid
       |  FROM (SELECT doc_id, unnest(shset) AS sh FROM sets))""".stripMargin

  private val shingleCtes = shingleCtesFrom("documents")

  /** Spark twin of the `docw` CTE: exploded (doc_id, wid) rows. */
  private def docWids(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), explode(col("shset")).as("sh"))
      .select(col("doc_id"), Dedup.md5Wid(col("sh")).as("wid"))

  /** Salt cells per language for the lang-partitioned sink writes:
    * bounds the largest (Zipfian-majority) language to ~1/64 of its
    * bytes per write task instead of one task per lang. Env-tunable
    * so a cluster run can raise it; the local default keeps the
    * driver's bench comparable (AQE coalesces the near-empty cells
    * at fixture scale either way). */
  private val SinkSaltBuckets: Int =
    sys.env.getOrElse("SPARK_GRAFT_SINK_SALT", "64").toInt

  // ------------------------------------------------- MinHash + LSH dedup
  private val MhK = 12
  private val MhBands = 4

  /** MinHash(12) + LSH(4×3) near-dup pairs with true-Jaccard
    * verification ≥ 0.5 — full recall on the planted dups including
    * cross-language ones (no blocking key). */
  private def qDedupMinhashLsh(implicit s: SparkSession, dir: String): DataFrame = {
    val sets  = shingleSets
    val docw  = docWids(sets)
    val sigs  = Dedup.minhashSignatures(docw, "doc_id", "wid", MhK)
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", MhBands, MhK / MhBands)
    // adaptive verification (bands only collide near-dups, so the
    // candidate set is tiny next to the corpus): measured-small pairs
    // broadcast and the shingle-set frame is scanned, never shuffled
    Dedup.jaccardForPairsAdaptive(cands, sets, "doc_id", "shset")
      .where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** [[qDedupMinhashLsh]] with candidate generation through the
    * native unary band-pairs node ([[graft.plans.LshBandJoinNative]])
    * instead of the banded self-join — same oracle SQL, same output,
    * half the shuffled bytes on the dedup tier's biggest stage. */
  private def qDedupMinhashLshNative(implicit s: SparkSession, dir: String): DataFrame = {
    val sets  = shingleSets
    val docw  = docWids(sets)
    val sigs  = Dedup.minhashSignatures(docw, "doc_id", "wid", MhK)
    val cands = Dedup.lshCandidatePairsNative(sigs, "doc_id", MhBands, MhK / MhBands)
    // same adaptive verification as [[qDedupMinhashLsh]]
    Dedup.jaccardForPairsAdaptive(cands, sets, "doc_id", "shset")
      .where(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The full MinHash(12)+LSH(4×3)+verify pipeline as a CTE chain
    * ending in `pairs(id_a, id_b, jaccard)` over a source relation:
    * used verbatim by the plain query (src = documents), the
    * exact-collapse-first scalable query (src = reps), and the
    * cluster-resolution query (which grows a recursive reachability
    * CTE on top of `pairs`). */
  private def minhashPairCtes(prefixCtes: String, src: String): String = {
    val mhCols = Dedup.hashCoeffs(MhK).zipWithIndex.map { case ((a, b), i) =>
      s"min((wid * $a + $b) %% ${Dedup.P}) AS mh_$i"
    }.mkString(", ").replace("%%", "%")
    val bandSelects = (0 until MhBands).map { bnd =>
      val sig = (0 until MhK / MhBands)
        .map(r => s"CAST(mh_${bnd * (MhK / MhBands) + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"SELECT doc_id, $bnd AS band, $sig AS bsig FROM sigs"
    }.mkString(" UNION ALL ")
    s"""$prefixCtes${shingleCtesFrom(src)},
       |sigs AS (SELECT doc_id, $mhCols FROM docw GROUP BY doc_id),
       |banded AS ($bandSelects),
       |cands AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x JOIN banded y
       |    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    round(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.shset, b.shset))), 6) AS jaccard
       |  FROM cands JOIN sets a ON cands.id_a = a.doc_id
       |             JOIN sets b ON cands.id_b = b.doc_id
       |  WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
       |      / len(list_distinct(list_concat(a.shset, b.shset))) >= 0.5)""".stripMargin
  }

  private def minhashSqlOver(prefixCtes: String, src: String): String =
    s"""WITH ${minhashPairCtes(prefixCtes, src)}
       |SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b""".stripMargin

  private val qDedupMinhashLshSql = minhashSqlOver("", "documents")

  // ------------------------------------------------ n-gram Jaccard dedup
  /** Blocked all-pairs n-gram Jaccard (the non-LSH contrast): block on
    * the 16-char prefix, verify ≥ 0.5. Blocking trades recall
    * (cross-prefix dups are the LSH query's job) for a tiny candidate
    * set. */
  private def qDedupNgramJaccard(implicit s: SparkSession, dir: String): DataFrame = {
    val sets = graft.core.Caches.track(docs.select(col("doc_id"),
      substring(col("text"), 1, 16).as("blk"),
      TextFns.shinglesDistinct(col("text"), 3).as("shset"))) // self-joined
    sets.alias("a").join(sets.alias("b"), "blk")
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        round(graft.plans.StringArrayJaccard(col("a.shset"), col("b.shset")), 6))
      .where(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private def ngramJaccardSqlOver(prefixCtes: String, src: String): String =
    s"""WITH $prefixCtes${shingleCtesFrom(src)},
       |blocked AS (
       |  SELECT s.doc_id, substr(d.text, 1, 16) AS blk, s.shset
       |  FROM sets s JOIN $src d ON s.doc_id = d.doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.shset, b.shset))), 6) AS jaccard
       |FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE round(CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
       |    / len(list_distinct(list_concat(a.shset, b.shset))), 6) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  private val qDedupNgramJaccardSql = ngramJaccardSqlOver("", "documents")

  /** Collapse-first prefix-blocked Jaccard — the n-gram twin of the
    * `_scalable` family: exact-duplicate texts share their 16-char
    * prefix block BY DEFINITION, so a K×-replicated corpus pays
    * K²-per-family verification in the plain contrast (27.3 M pairs
    * at sf10, measured); collapsing to min-id representatives first
    * blocks only the 5 k distinct texts. Same oracle construction
    * prefixed with the reps collapse. */
  private def qDedupNgramScalable(implicit s: SparkSession, dir: String): DataFrame = {
    val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val sets = graft.core.Caches.track(reps.select(col("doc_id"),
      substring(col("text"), 1, 16).as("blk"),
      TextFns.shinglesDistinct(col("text"), 3).as("shset"))) // self-joined
    sets.alias("a").join(sets.alias("b"), "blk")
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("jaccard",
        round(graft.plans.StringArrayJaccard(col("a.shset"), col("b.shset")), 6))
      .where(col("jaccard") >= 0.5)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val qDedupNgramScalableSql = ngramJaccardSqlOver(
    "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
    "reps")

  // ----------------------------------------------------- SimHash dedup
  /** SimHash(16-bit) pairs within Hamming ≤ 3, 4-segment pigeonhole
    * blocked (full recall: ≤3 differing bits leave ≥1 of the 4
    * disjoint 4-bit segments intact). Fingerprints vote over 3-gram
    * shingle ids; the small LCG multiplier keeps the hash inside
    * BIGINT on both engines. */
  private def qDedupSimhash(implicit s: SparkSession, dir: String): DataFrame = {
    val docw = docWids(shingleSets)
    val fps = Dedup.simhashFingerprints(docw, "doc_id", "wid", bits = 16)
    Dedup.simhashPairs(fps, "doc_id", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  private def simhashSqlOver(prefixCtes: String, src: String): String = {
    val votes = (0 until 16).map { b =>
      s"SUM(CASE WHEN ((wid * 1103515245 + 12345) % 2147483648 >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b"
    }.mkString(", ")
    val fp = (0 until 16).map(b => s"CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH $prefixCtes${shingleCtesFrom(src)},
       |votes AS (SELECT doc_id, $votes FROM docw GROUP BY doc_id),
       |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes),
       |blocked AS (
       |  SELECT doc_id, simhash, seg, (simhash >> (seg * 4)) & 15 AS segval
       |  FROM fps CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS seg))
       |SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
       |FROM blocked x JOIN blocked y
       |  ON x.seg = y.seg AND x.segval = y.segval AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  private val qDedupSimhashSql = simhashSqlOver("", "documents")

  /** The SCALE path for SimHash: collapse exact-duplicate texts to
    * their minimum-id representative FIRST, then fingerprint and
    * pigeonhole-block the representatives — the SimHash twin of
    * `q_dedup_minhash_scalable` / `q_dedup_embed_scalable`. The
    * pigeonhole blocks of the plain query hold every member of an
    * exact-duplicate family (identical text → identical fingerprint →
    * same segment values in all 4 segments), so a K×-replicated
    * corpus pays K² verification pairs per family per segment — the
    * r10 sf10 probe measured the uncollapsed query at ~20 min for
    * 500 k docs with 100× replication, while this path fingerprints
    * 5 k representatives in seconds. Same oracle construction,
    * prefixed with the reps collapse. */
  private def qDedupSimhashScalable(implicit s: SparkSession, dir: String): DataFrame = {
    val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val sets = graft.core.Caches.track(reps.select(col("doc_id"),
      TextFns.shinglesDistinct(col("text"), 3).as("shset")))
    val fps = Dedup.simhashFingerprints(docWids(sets), "doc_id", "wid", bits = 16)
    Dedup.simhashPairs(fps, "doc_id", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val qDedupSimhashScalableSql = simhashSqlOver(
    "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
    "reps")

  // ------------------------------------------------- similarity search
  private def queryVecs(implicit s: SparkSession, dir: String): DataFrame =
    embs.where(col("vec_id") < 5)

  private def qCosineTopK(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(queryVecs, embs, "vec_id", "vec_id", "embedding", 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  private val cosineSqlExpr =
    """round(
      |  list_aggregate(list_transform(list_zip(q.embedding, c.embedding),
      |    p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum')
      |  / (sqrt(list_aggregate(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))
      |     * sqrt(list_aggregate(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x), 'sum'))), 6)""".stripMargin

  private val qCosineTopKSql =
    s"""WITH q AS (SELECT * FROM embeddings WHERE vec_id < 5),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |    $cosineSqlExpr AS sim
       |  FROM q CROSS JOIN embeddings c WHERE q.vec_id <> c.vec_id)
       |SELECT query_id, rk, vec_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rk FROM scored)
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** ANN via deterministic multi-table random-hyperplane LSH (6
    * tables × 3 planes, ~0.74 recall@10 on these near-uniform
    * vectors): per-table bucket join, candidate union, exact cosine
    * re-rank. */
  private val LshTables = 6
  private val LshPlanes = 3
  private def qAnnLsh(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(queryVecs, embs, "vec_id", "vec_id", "embedding",
        planes = LshPlanes, k = 10, tables = LshTables)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  private val qAnnLshSql = {
    def bucket(t: Int) = (0 until LshPlanes).map { p =>
      val g = t * LshPlanes + p
      s"""CASE WHEN list_aggregate(list_transform(embedding,
         |  (x, j) -> CAST(x AS DOUBLE) * ((j * ${2 * g + 3}) % 17 - 8)), 'sum') > 0
         |  THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    val tableCands = (0 until LshTables).map { t =>
      s"""SELECT q.vec_id AS query_id, c.vec_id AS vec_id
         |FROM (SELECT vec_id, CAST(${bucket(t)} AS BIGINT) AS bkt FROM embeddings WHERE vec_id < 5) q
         |JOIN (SELECT vec_id, CAST(${bucket(t)} AS BIGINT) AS bkt FROM embeddings) c
         |  ON q.bkt = c.bkt AND q.vec_id <> c.vec_id""".stripMargin
    }.mkString(" UNION ")
    s"""WITH cands AS ($tableCands),
       |scored AS (
       |  SELECT cands.query_id, cands.vec_id,
       |    $cosineSqlExpr AS sim
       |  FROM cands
       |  JOIN embeddings q ON cands.query_id = q.vec_id
       |  JOIN embeddings c ON cands.vec_id = c.vec_id)
       |SELECT query_id, rk, vec_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rk FROM scored)
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin
  }

  // --------------------------------------------- product quantization
  /** PRODUCT-QUANTIZATION top-k ([[Similarity.pqTopK]], Jégou et al.
    * 2011): the 64-dim vectors re-code as 4 sub-block codes (4
    * centroids each — fixed-init exact-decimal Lloyd's per block, the
    * `q_kmeans_exact` trainer on sliced sub-vectors), queries rank
    * the corpus by asymmetric distance against the reconstructed
    * codes, and the top-30 candidates re-rank by exact cosine. The
    * oracle unrolls all four per-block Lloyd's chains, the ADC fold,
    * and the re-rank — code assignments, candidate sets, and final
    * ranks all hash-match. Storage story at 100 TB: 8 bits/vector of
    * code vs 256 bytes of float32 — the index scan reads codes, and
    * only `cands` true vectors per query are ever touched. */
  private val PqBlocks = 4
  private val PqCodes = 4
  private val PqIters = 2
  private val PqCands = 30

  private def qPqTopK(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.pqTopK(queryVecs, embs, "vec_id", "vec_id", "embedding",
        blocks = PqBlocks, codes = PqCodes, iters = PqIters,
        cands = PqCands, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  /** SCALAR-QUANTIZATION sibling ([[Similarity.sqTopK]], FAISS
    * `IndexScalarQuantizer` SQ8 — the vector tier's OTHER lossy
    * storage format): per-dimension 8-bit codes against learned
    * [min, max) bounds (no codebook training — 2·dim doubles is the
    * whole model), midpoint-reconstruction ADC, exact re-rank of the
    * top-`PqCands`. Oracle-exact: bounds are exact min/max of cast
    * doubles, codes are clamped floors, and the ADC is the
    * sequential 1..64 fold both engines replay; candidate and rank
    * windows tie-break on vec_id. Like `q_embed_pq_topk`, the scan
    * is the documented LINEAR flat-index contrast — the serving
    * composite prunes with the IVF probe as `q_embed_ivfpq` does. */
  private def qEmbedSq(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.sqTopK(queryVecs, embs, "vec_id", "vec_id", "embedding",
        cands = PqCands, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  private val qEmbedSqSql =
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |b AS MATERIALIZED (
       |  SELECT pos, min(CAST(v AS DOUBLE)) AS mn,
       |    (max(CAST(v AS DOUBLE)) - min(CAST(v AS DOUBLE))) / 256.0 AS step
       |  FROM (SELECT unnest(embedding) AS v,
       |          generate_subscripts(embedding, 1) AS pos FROM embeddings)
       |  GROUP BY pos),
       |bounds AS MATERIALIZED (
       |  SELECT list(mn ORDER BY pos) AS mns,
       |    list(step ORDER BY pos) AS steps FROM b),
       |adc AS (
       |  SELECT q.vec_id AS query_id, c.vec_id,
       |    round(list_aggregate(list_transform(
       |      list_transform(range(1, 65), j ->
       |        CAST(q.embedding[j] AS DOUBLE) - (bo.mns[j] +
       |          (CAST(CASE WHEN bo.steps[j] = 0 THEN 0 ELSE
       |             least(255, greatest(0,
       |               floor((CAST(c.embedding[j] AS DOUBLE) - bo.mns[j]) / bo.steps[j])))
       |           END AS DOUBLE) + 0.5) * bo.steps[j])),
       |      d -> d * d), 'sum'), 6) AS adc
       |  FROM (SELECT * FROM e WHERE vec_id < 5) q
       |  CROSS JOIN e c CROSS JOIN bounds bo
       |  WHERE q.vec_id <> c.vec_id),
       |$pqRerankTailSql""".stripMargin

  private def pqSqDuck(a: String, b: String) =
    s"""list_aggregate(list_transform(list_zip($a, $b),
       |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
       |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')""".stripMargin

  /** Per-block fixed-init 2-round Lloyd's chains + the reconstruction
    * CTE (`recon`: vec_id → per-block centroid arrays r0..rN) over a
    * CTE `e(vec_id, embedding)` — the DuckDB twin of
    * [[Similarity.pqTopK]]'s codebook training, shared by the plain-PQ
    * and IVF-PQ oracles. */
  private lazy val pqTrainCtes: String = {
    val len = 64 / PqBlocks
    def argmin(d: String) =
      s"""SELECT vec_id, cid AS code FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist, cid) AS rk FROM $d) WHERE rk = 1""".stripMargin
    // one fixed-init 2-round Lloyd's chain per sub-block
    val blockCtes = (0 until PqBlocks).map { m =>
      val off = m * len
      s"""sub_$m AS (
         |  SELECT vec_id, list_slice(embedding, ${off + 1}, ${off + len}) AS sv
         |  FROM e),
         |c0_$m AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cid,
         |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS c
         |  FROM sub_$m WHERE vec_id < $PqCodes),
         |d0_$m AS (
         |  SELECT s.vec_id, c.cid, ${pqSqDuck("s.sv", "c.c")} AS dist
         |  FROM sub_$m s CROSS JOIN c0_$m c),
         |a0_$m AS (${argmin(s"d0_$m")}),
         |c1_$m AS (
         |  SELECT cid, list(cd ORDER BY pos) AS c FROM (
         |    SELECT a.code AS cid, ls.pos,
         |      CAST(SUM(CAST(CAST(ls.v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
         |        / COUNT(*) AS cd
         |    FROM (SELECT vec_id, unnest(sv) AS v,
         |            generate_subscripts(sv, 1) AS pos FROM sub_$m) ls
         |    JOIN a0_$m a ON a.vec_id = ls.vec_id
         |    GROUP BY 1, 2)
         |  GROUP BY cid),
         |d1_$m AS (
         |  SELECT s.vec_id, c.cid, ${pqSqDuck("s.sv", "c.c")} AS dist
         |  FROM sub_$m s CROSS JOIN c1_$m c),
         |a1_$m AS (${argmin(s"d1_$m")})""".stripMargin
    }.mkString(",\n")
    val reconJoins = (0 until PqBlocks).map(m =>
      s"JOIN a1_$m ON a1_$m.vec_id = e.vec_id\n" +
        s"  JOIN c1_$m r$m ON r$m.cid = a1_$m.code").mkString("\n  ")
    s"""$blockCtes,
       |recon AS (
       |  SELECT e.vec_id, ${(0 until PqBlocks).map(m => s"r$m.c AS r$m").mkString(", ")}
       |  FROM e
       |  $reconJoins)""".stripMargin
  }

  /** [[pqTrainCtes]] with the TRAINING corpus split from the CODED
    * corpus — the day-2 frozen-codebook oracle: Lloyd's chains run
    * over `$train` only (the day-0 subset), then EVERY `$code` vector
    * is coded by argmin against the frozen c1 centroids (for day-0
    * members that argmin IS the training chain's own a1 assignment,
    * so this replays write-then-absorb exactly). */
  private def pqTrainCtesSplit(train: String, code: String): String = {
    val len = 64 / PqBlocks
    def argmin(d: String) =
      s"""SELECT vec_id, cid AS code FROM (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY dist, cid) AS rk FROM $d) WHERE rk = 1""".stripMargin
    val blockCtes = (0 until PqBlocks).map { m =>
      val off = m * len
      s"""tsub_$m AS (
         |  SELECT vec_id, list_slice(embedding, ${off + 1}, ${off + len}) AS sv
         |  FROM $train),
         |c0_$m AS (
         |  SELECT CAST(vec_id AS INTEGER) AS cid,
         |    list_transform(sv, x -> CAST(x AS DOUBLE)) AS c
         |  FROM tsub_$m WHERE vec_id < $PqCodes),
         |d0_$m AS (
         |  SELECT s.vec_id, c.cid, ${pqSqDuck("s.sv", "c.c")} AS dist
         |  FROM tsub_$m s CROSS JOIN c0_$m c),
         |a0_$m AS (${argmin(s"d0_$m")}),
         |c1_$m AS (
         |  SELECT cid, list(cd ORDER BY pos) AS c FROM (
         |    SELECT a.code AS cid, ls.pos,
         |      CAST(SUM(CAST(CAST(ls.v AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
         |        / COUNT(*) AS cd
         |    FROM (SELECT vec_id, unnest(sv) AS v,
         |            generate_subscripts(sv, 1) AS pos FROM tsub_$m) ls
         |    JOIN a0_$m a ON a.vec_id = ls.vec_id
         |    GROUP BY 1, 2)
         |  GROUP BY cid),
         |sub_$m AS (
         |  SELECT vec_id, list_slice(embedding, ${off + 1}, ${off + len}) AS sv
         |  FROM $code),
         |d1_$m AS (
         |  SELECT s.vec_id, c.cid, ${pqSqDuck("s.sv", "c.c")} AS dist
         |  FROM sub_$m s CROSS JOIN c1_$m c),
         |a1_$m AS (${argmin(s"d1_$m")})""".stripMargin
    }.mkString(",\n")
    val reconJoins = (0 until PqBlocks).map(m =>
      s"JOIN a1_$m ON a1_$m.vec_id = cv.vec_id\n" +
        s"  JOIN c1_$m r$m ON r$m.cid = a1_$m.code").mkString("\n  ")
    s"""$blockCtes,
       |recon AS (
       |  SELECT cv.vec_id, ${(0 until PqBlocks).map(m => s"r$m.c AS r$m").mkString(", ")}
       |  FROM $code cv
       |  $reconJoins)""".stripMargin
  }

  /** Asymmetric-distance expression over `q.embedding` and the recon
    * row `r` — the ADC fold's DuckDB twin. */
  private lazy val pqAdcDuck: String = {
    val len = 64 / PqBlocks
    (0 until PqBlocks).map { m =>
      val off = m * len
      pqSqDuck(s"list_slice(q.embedding, ${off + 1}, ${off + len})", s"r.r$m")
    }.mkString("\n  + ")
  }

  /** cand (ADC top-`cands`) → exact-cosine re-rank — the shared tail
    * of the PQ-family oracles, over a CTE `adc(query_id, vec_id, adc)`
    * and `e`. */
  private lazy val pqRerankTailSql: String =
    s"""cand AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, vec_id) AS crk FROM adc)
       |  WHERE crk <= $PqCands),
       |scored AS (
       |  SELECT cand.query_id, cand.vec_id, $cosineSqlExpr AS sim
       |  FROM cand
       |  JOIN e q ON cand.query_id = q.vec_id
       |  JOIN e c ON cand.vec_id = c.vec_id)
       |SELECT query_id, rk, vec_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rk FROM scored)
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val qPqTopKSql =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |$pqTrainCtes,
       |adc AS (
       |  SELECT q.vec_id AS query_id, r.vec_id,
       |    round($pqAdcDuck, 6) AS adc
       |  FROM (SELECT * FROM e WHERE vec_id < 5) q CROSS JOIN recon r
       |  WHERE q.vec_id <> r.vec_id),
       |$pqRerankTailSql""".stripMargin

  /** IVF probe search over the precomputed label cells. Oracle-exact:
    * cell ranking uses exact decimal centroid numerators (see
    * [[Similarity.ivfTopK]]), so the probed cells and the final
    * rounded cosines are cross-engine deterministic. */
  private def qIvfTopK(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(queryVecs, embs, "vec_id", "vec_id", "embedding",
        "label", probes = 2, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  /** [[qIvfTopK]] served from the PERSISTED index (the reference's
    * save-the-FAISS-index-to-disk lifecycle): build once via
    * `IvfStore.writeOnce` — vectors partitioned by cell, centroids as
    * exact numerators — then answer the query set from the artifact;
    * the probed cells' literal filter prunes whole cell directories
    * (PartitionFilters, spec-asserted) and the raw corpus is never
    * read. Same oracle as the from-scratch path: identical output. */
  private def qIvfStore(implicit s: SparkSession, dir: String): DataFrame = {
    val tag = "ivf_" + java.lang.Integer.toHexString(dir.hashCode)
    Similarity.IvfStore.writeOnce(s, embs, "vec_id", "embedding", "label", tag)
    Similarity.ivfTopKFromStore(s, queryVecs, tag, "vec_id", "vec_id",
        "embedding", "label", probes = 2, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Day-2 of the index lifecycle: day-0 index over ~6/7 of the
    * corpus, the rest absorbed as a delta (centroid NUMERATORS merge
    * by exact decimal addition — no old-corpus re-read, no
    * re-rounding), day-2 queries served from the absorbed index. The
    * absorbed index is bit-identical to a from-scratch build over the
    * full corpus, so the SAME oracle as [[qIvfTopK]] gates it. */
  private def qIvfStoreDay2(implicit s: SparkSession, dir: String): DataFrame = {
    val hex = java.lang.Integer.toHexString(dir.hashCode)
    val day0 = embs.where(col("vec_id") % 7 =!= 3)
    val delta = embs.where(col("vec_id") % 7 === 3)
    Similarity.IvfStore.writeOnce(s, day0, "vec_id", "embedding", "label",
      s"ivf_${hex}_d0")
    Similarity.IvfStore.absorbOnce(s, s"ivf_${hex}_d0", s"ivf_${hex}_d1",
      delta, "vec_id", "embedding", "label")
    Similarity.ivfTopKFromStore(s, queryVecs, s"ivf_${hex}_d1",
        "vec_id", "vec_id", "embedding", "label", probes = 2, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** The coarse-probe CTE chain (exact decimal centroid numerators →
    * per-query top-2 cells as `probed(query_id, label)`) — the DuckDB
    * twin of [[Similarity.ivfTopK]]'s probe, shared by the IVF and
    * IVF-PQ oracles. */
  private val ivfProbeCtes =
    s"""longfmt AS (
       |  SELECT vec_id, label, unnest(embedding) AS v,
       |    generate_subscripts(embedding, 1) AS pos
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, pos,
       |    CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(23,10))) AS DECIMAL(23,10)) AS cn,
       |    COUNT(*) AS n
       |  FROM longfmt GROUP BY 1, 2),
       |qdim AS (
       |  SELECT vec_id AS query_id, v AS qv, pos FROM longfmt WHERE vec_id < 5),
       |cs AS (
       |  SELECT query_id, label,
       |    round(CAST(SUM(CAST(CAST(qv AS DOUBLE) AS DECIMAL(14,10)) * cn) AS DOUBLE)
       |      / MAX(n), 6) AS cell_sim
       |  FROM qdim JOIN cent ON qdim.pos = cent.pos
       |  GROUP BY 1, 2),
       |probed AS (
       |  SELECT query_id, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cell_sim DESC, label) AS crk FROM cs)
       |  WHERE crk <= 2)""".stripMargin

  private val qIvfTopKSql =
    s"""WITH $ivfProbeCtes,
       |scored AS (
       |  SELECT p.query_id, c.vec_id,
       |    $cosineSqlExpr AS sim
       |  FROM probed p
       |  JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
       |  JOIN embeddings q ON q.vec_id = p.query_id)
       |SELECT query_id, rk, vec_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rk FROM scored)
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** STREAMING ANN INGEST ([[graft.streaming.EventStreams.streamingIvfIngest]]):
    * the IVF index's absorb deployed as a foreachBatch micro-batch
    * stream — each batch of new vectors absorbs into a new index
    * generation by exact decimal numerator ADDITION, so the chain of
    * per-batch absorbs is bit-identical to the from-scratch build
    * over corpus ∪ delta and the final probe gates against the SAME
    * oracle as `q_embed_ivf` (batch-boundary invariance by algebra;
    * StreamingSpec asserts parts=1 ≡ parts=3 ≡ one-shot absorb). */
  private def qStreamAnnIngest(implicit s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.streamingIvfIngest(s, dir, parts = 3)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  /** IVF-PQ composite serving ([[Similarity.ivfPqTopK]], the FAISS
    * IVFPQ architecture, Jégou et al. 2011 §V): the decimal-exact IVF
    * probe prunes to 2 cells, asymmetric PQ distance (the
    * `q_embed_pq_topk` codebooks) ranks only the probed cells'
    * members, the top-30 survivors re-rank by exact cosine. The
    * oracle composes the IVF probe chain with the PQ training chain —
    * probed cells, code assignments, candidate sets, and final ranks
    * all hash-match. At 100 TB this is the serving shape: the probe
    * reads nlist·dim centroid state, ADC reads 4 small codes per
    * vector for ~probes/nlist of the corpus, and only 30 true vectors
    * per query are ever touched. */
  private def qIvfPq(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(queryVecs, embs, "vec_id", "vec_id", "embedding",
        "label", probes = 2, blocks = PqBlocks, codes = PqCodes,
        iters = PqIters, cands = PqCands, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  private val qIvfPqSql =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |$ivfProbeCtes,
       |$pqTrainCtes,
       |adc AS (
       |  SELECT p.query_id, r.vec_id,
       |    round($pqAdcDuck, 6) AS adc
       |  FROM probed p
       |  JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
       |  JOIN recon r ON r.vec_id = c.vec_id
       |  JOIN e q ON q.vec_id = p.query_id),
       |$pqRerankTailSql""".stripMargin

  /** [[qIvfPq]] served from the PERSISTED composite index
    * ([[Similarity.IvfPqStore]]): centroid numerators + PQ codebooks
    * trained and written once, ADC served from the cell-partitioned
    * CODES table (blocks small ints per vector — the ~32× narrower
    * scan), true vectors read ONLY for the 30 candidates' re-rank.
    * Bit-identical to the from-scratch composite, so the same oracle
    * gates it. */
  private def qIvfPqStore(implicit s: SparkSession, dir: String): DataFrame = {
    val tag = "ivfpq_" + java.lang.Integer.toHexString(dir.hashCode)
    Similarity.IvfPqStore.writeOnce(s, embs, "vec_id", "embedding", "label",
      blocks = PqBlocks, codes = PqCodes, iters = PqIters, tag = tag)
    Similarity.IvfPqStore.topK(s, queryVecs, tag, "vec_id", "vec_id",
        "embedding", "label", probes = 2, cands = PqCands, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** Day-2 of the composite index ([[Similarity.IvfPqStore.absorb]],
    * the FAISS `add` contract — quantizers NEVER retrain on add):
    * day-0 index over ~6/7 of the corpus, the rest absorbed as a
    * delta coded by argmin against the FROZEN day-0 codebooks;
    * centroid numerators merge by exact decimal addition. The oracle
    * trains its Lloyd's chains on the day-0 subset only, then codes
    * EVERY vector with the frozen centroids — bit-identical to
    * write-then-absorb (for day-0 members the frozen-codebook argmin
    * IS the training chain's own final assignment). */
  private def qIvfPqStoreDay2(implicit s: SparkSession, dir: String): DataFrame = {
    val hex = java.lang.Integer.toHexString(dir.hashCode)
    val day0 = embs.where(col("vec_id") % 7 =!= 5)
    val delta = embs.where(col("vec_id") % 7 === 5)
    Similarity.IvfPqStore.writeOnce(s, day0, "vec_id", "embedding", "label",
      blocks = PqBlocks, codes = PqCodes, iters = PqIters,
      tag = s"ivfpq_${hex}_d0")
    Similarity.IvfPqStore.absorbOnce(s, s"ivfpq_${hex}_d0",
      s"ivfpq_${hex}_d1", delta, "vec_id", "embedding", "label")
    Similarity.IvfPqStore.topK(s, queryVecs, s"ivfpq_${hex}_d1", "vec_id",
        "vec_id", "embedding", "label", probes = 2, cands = PqCands, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  private val qIvfPqDay2Sql =
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |e0 AS (SELECT vec_id, embedding FROM e WHERE vec_id % 7 <> 5),
       |$ivfProbeCtes,
       |${pqTrainCtesSplit("e0", "e")},
       |adc AS (
       |  SELECT p.query_id, r.vec_id,
       |    round($pqAdcDuck, 6) AS adc
       |  FROM probed p
       |  JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
       |  JOIN recon r ON r.vec_id = c.vec_id
       |  JOIN e q ON q.vec_id = p.query_id),
       |$pqRerankTailSql""".stripMargin

  /** Hard-negative mining ([[Similarity.hardNegatives]], the DPR
    * recipe): per query, the top-10 corpus vectors by cosine BELOW
    * τ = 0.3 — confusable near-misses for contrastive training,
    * with the ≥ τ band excluded as positives/duplicates. Served
    * through the 2-cell IVF probe (a near-miss lives in the query's
    * own neighborhood, so the pruning and the semantics agree);
    * the oracle replays probe, band filter, and rank. */
  private def qHardNegatives(implicit s: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(queryVecs, embs, "vec_id", "vec_id",
        "embedding", "label", probes = 2, tau = 0.3, k = 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rk"))

  private val qHardNegativesSql =
    s"""WITH $ivfProbeCtes,
       |scored AS (
       |  SELECT p.query_id, c.vec_id,
       |    $cosineSqlExpr AS sim
       |  FROM probed p
       |  JOIN embeddings c ON c.label = p.label AND c.vec_id <> p.query_id
       |  JOIN embeddings q ON q.vec_id = p.query_id)
       |SELECT query_id, rk, vec_id, sim FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, vec_id) AS INTEGER) AS rk
       |  FROM scored WHERE sim < 0.3)
       |WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  /** Maximal Marginal Relevance selection ([[Similarity.mmrSelect]],
    * Carbonell & Goldstein 1998): 8 picks for query vector 0 at
    * λ = 0.5 — relevance traded against redundancy, so the selection
    * spreads across the corpus's similarity modes instead of stacking
    * the query's nearest near-duplicates (the diversity-aware
    * retrieval / training-data selection shape). Oracle-exact: both
    * similarity legs are fixed-order folds rounded to 6 before the
    * λ-blend and ties break on vec_id, so the greedy trajectory
    * replays as an unrolled CTE chain (the `q_kcenter_select`
    * pattern). λ is 0.5 HERE because the gate demands cross-engine
    * bit-equality of the blend constants: 0.5 and 1−0.5 are exact in
    * both engines' literal parsers, while 1.0−0.7 =
    * 0.30000000000000004 would round-trip through DuckDB's
    * DECIMAL-literal path (two roundings: int→double, then /10^17)
    * with no bit-exactness guarantee. */
  private val MmrK = 8
  private val MmrLambda = 0.5

  private def qMmrSelect(implicit s: SparkSession, dir: String): DataFrame = {
    val picks = Similarity.mmrSelect(embs, "vec_id", "embedding",
      queryId = 0L, k = MmrK, lambda = MmrLambda)
    import s.implicits._
    picks.toDF("rk", "vec_id", "simq").orderBy(col("rk"))
  }

  private def mmrCosDuck(a: String, b: String) =
    s"""round(
       |  list_aggregate(list_transform(list_zip($a, $b),
       |    p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum')
       |  / (sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * x), 'sum'))
       |     * sqrt(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE) * x), 'sum'))), 6)""".stripMargin

  /** The unrolled MMR greedy trajectory over a caller-supplied
    * `base(vec_id, simq)` CTE — shared by the full-corpus oracle
    * (base = every non-query vector) and the probe-bounded oracle
    * (base = the IVF top-C pool). */
  private def mmrTrajectorySql(baseCtes: String): String = {
    def centerOf(i: Int) =
      s"(SELECT e2.embedding FROM e e2 WHERE e2.vec_id = (SELECT vec_id FROM p$i))"
    val rounds = (2 to MmrK).map { i =>
      val prev = s"s${i - 1}"
      val pick =
        s"""p$i AS MATERIALIZED (
           |  SELECT vec_id, simq FROM $prev
           |  ORDER BY $MmrLambda * simq - ${1.0 - MmrLambda} * maxs DESC, vec_id
           |  LIMIT 1)""".stripMargin
      val next =
        s"""s$i AS MATERIALIZED (
           |  SELECT s.vec_id, s.simq,
           |    greatest(s.maxs, ${mmrCosDuck("e.embedding", centerOf(i))}) AS maxs
           |  FROM $prev s JOIN e ON e.vec_id = s.vec_id
           |  WHERE s.vec_id <> (SELECT vec_id FROM p$i))""".stripMargin
      if (i == MmrK) pick else s"$pick,\n$next"
    }.mkString(",\n")
    val sel = (1 to MmrK)
      .map(i => s"SELECT CAST($i AS INTEGER) AS rk, vec_id, simq FROM p$i")
      .mkString("\nUNION ALL ")
    // e MATERIALIZED: the unrolled chain references the corpus ~3×
    // per round (center subquery appears in both cosine norms); an
    // inlined CTE would open the parquet once per reference per
    // DuckDB thread and trip the fd limit
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
       |$baseCtes,
       |p1 AS MATERIALIZED (
       |  SELECT vec_id, simq FROM base ORDER BY simq DESC, vec_id LIMIT 1),
       |s1 AS MATERIALIZED (
       |  SELECT b.vec_id, b.simq,
       |    ${mmrCosDuck("e.embedding", centerOf(1))} AS maxs
       |  FROM base b JOIN e ON e.vec_id = b.vec_id
       |  WHERE b.vec_id <> (SELECT vec_id FROM p1)),
       |$rounds
       |$sel
       |ORDER BY rk""".stripMargin
  }

  private val qMmrSelectSql = mmrTrajectorySql(
    s"""base AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    ${mmrCosDuck("e.embedding", "(SELECT embedding FROM e WHERE vec_id = 0)")} AS simq
       |  FROM e WHERE e.vec_id <> 0)""".stripMargin)

  /** [[Similarity.mmrSelectScalable]] — the DEPLOYABLE MMR: an IVF
    * probe retrieves the top-`MmrPoolC` candidates (2 cells,
    * cell-pruned scan, exact cosine rank — the `q_embed_ivf` probe),
    * and the SAME exact greedy runs over that pool: k driver actions
    * over C rows instead of k corpus scans. At 100 TB the corpus is
    * touched once (pruned to ~probes/nlist) and the greedy state is
    * C rows. Oracle-exact: the probe chain, the top-C window, and the
    * unrolled trajectory all replay in SQL ([[mmrTrajectorySql]] with
    * base = the pool); SimilaritySpec pins C = corpus ≡ plain
    * [[Similarity.mmrSelect]]. */
  private val MmrPoolC = 200

  private def qMmrSelectScalable(implicit s: SparkSession, dir: String): DataFrame = {
    val picks = Similarity.mmrSelectScalable(embs, "vec_id", "embedding",
      "label", queryId = 0L, k = MmrK, lambda = MmrLambda, probes = 2,
      poolC = MmrPoolC)
    import s.implicits._
    picks.toDF("rk", "vec_id", "simq").orderBy(col("rk"))
  }

  private val qMmrSelectScalableSql = mmrTrajectorySql(
    s"""$ivfProbeCtes,
       |pool AS MATERIALIZED (
       |  SELECT vec_id, simq FROM (
       |    SELECT vec_id, simq,
       |      row_number() OVER (ORDER BY simq DESC, vec_id) AS prk
       |    FROM (
       |      SELECT c.vec_id,
       |        ${mmrCosDuck("c.embedding", "(SELECT embedding FROM e WHERE vec_id = 0)")} AS simq
       |      FROM probed p
       |      JOIN embeddings c ON c.label = p.label AND c.vec_id <> 0
       |      WHERE p.query_id = 0))
       |  WHERE prk <= $MmrPoolC),
       |base AS MATERIALIZED (SELECT vec_id, simq FROM pool)""".stripMargin)

  /** Greedy k-center selection (KCenterSampling) — 8 centers over the
    * corpus; driver-looped farthest-point. Oracle-exact: both engines
    * compute squared distances as sequential left folds over the
    * vector (bit-identical doubles), and ties break on vec_id, so the
    * 8-round greedy choice is reproducible — the oracle unrolls the
    * same loop as chained CTEs. */
  private def qKCenter(implicit s: SparkSession, dir: String): DataFrame = {
    val chosen = Similarity.kcenterGreedy(embs, "vec_id", "embedding",
      k = 8, seedId = 0L)
    import s.implicits._
    chosen.zipWithIndex.map { case (id, i) => (i + 1, id) }
      .toDF("rk", "vec_id")
      .orderBy(col("rk"))
  }

  private val qKCenterSql = {
    def sq(a: String, b: String) =
      s"""list_aggregate(list_transform(list_zip($a, $b),
         |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum')""".stripMargin
    val rounds = (1 until 8).map { i =>
      val prevD = if (i == 1) "d1" else s"d$i"
      val centerOf =
        s"(SELECT e2.embedding FROM e e2 WHERE e2.vec_id = (SELECT vec_id FROM p$i))"
      val nextD =
        s"""d${i + 1} AS (
           |  SELECT d.vec_id, least(d.mind, ${sq("e.embedding", centerOf)}) AS mind
           |  FROM $prevD d JOIN e ON e.vec_id = d.vec_id)""".stripMargin
      val pick =
        s"""p$i AS (
           |  SELECT vec_id FROM $prevD ORDER BY mind DESC, vec_id LIMIT 1)""".stripMargin
      s"$pick,\n$nextD"
    }.mkString(",\n")
    val sel = (1 until 8)
      .map(i => s"SELECT CAST(${i + 1} AS INTEGER) AS rk, vec_id FROM p$i")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |d1 AS (
       |  SELECT e.vec_id,
       |    ${sq("e.embedding", "(SELECT embedding FROM e WHERE vec_id = 0)")} AS mind
       |  FROM e),
       |$rounds
       |SELECT CAST(1 AS INTEGER) AS rk, CAST(0 AS BIGINT) AS vec_id
       |UNION ALL $sel
       |ORDER BY rk""".stripMargin
  }

  // ------------------------------------------------------ text analysis
  private def qLangId(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"), col("lang"),
        TextFns.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private val qLangIdSql = {
    def hits(markers: Seq[String]) = markers.map { w =>
      s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2}"
    }.mkString(" + ")
    val scores = TextFns.LangMarkers.map { case (l, ms) => s"(${hits(ms)}) AS s_$l" }
      .mkString(", ")
    val langs = TextFns.LangMarkers.map(_._1)
    val m = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    s"""SELECT doc_id, lang, CASE $pick END AS lang_pred FROM (
       |  SELECT doc_id, lang, $m AS m, ${langs.map("s_" + _).mkString(", ")} FROM (
       |    SELECT doc_id, lang, $scores FROM documents))
       |ORDER BY doc_id""".stripMargin
  }

  private def qQualityScore(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"),
        TextFns.qualityScore(col("text")).as("quality"),
        round(TextFns.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TextFns.punctRatio(col("text")), 6).as("punct_ratio"))
      .orderBy(col("doc_id"))

  /** (stopRatio, punct, quality) DuckDB fragments over a `text`
    * column — the SQL twin of [[TextFns.qualityScore]], shared by the
    * standalone quality query and the curation pipeline. */
  private lazy val qualitySqlBits: (String, String, String) = {
    val tokCount = """len(string_split_regex(trim(text), '\s+'))"""
    val stopHits = TextFns.Stopwords.map { w =>
      s"(length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' $w ', ''))) // ${w.length + 2}"
    }.mkString(" + ")
    val punct = s"CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)"
    val wordLen = s"CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / $tokCount"
    val stopRatio = s"CAST($stopHits AS DOUBLE) / $tokCount"
    val quality =
      s"""round(least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.4
         |    + (1.0 - $punct) * 0.2
         |    + least($stopRatio * 5.0, 1.0) * 0.2
         |    + (CASE WHEN $wordLen BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.2, 6)""".stripMargin
    (stopRatio, punct, quality)
  }

  private val qQualityScoreSql = {
    val (stopRatio, punct, quality) = qualitySqlBits
    s"""SELECT doc_id,
       |  $quality AS quality,
       |  round($stopRatio, 6) AS stopword_ratio,
       |  round($punct, 6) AS punct_ratio
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private def qTokenCounts(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFns.subwordCount(col("text")).as("n_subwords"),
        round(TextFns.avgWordLen(col("text")), 6).as("avg_word_len"))
      .orderBy(col("doc_id"))

  private val qTokenCountsSql =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
      |  CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\s+'),
      |    w -> 1 + length(w) // 6), 'sum') AS BIGINT) AS n_subwords,
      |  round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
      |    / len(string_split_regex(trim(text), '\s+')), 6) AS avg_word_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** The native expressions through the SQL door: registered via
    * [[graft.plans.GraftFunctions]] (SparkSessionExtensions-
    * compatible), then used from `spark.sql`. */
  private def qSqlFunctions(implicit s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    docs.createOrReplaceTempView("documents_fn")
    s.sql("""
      SELECT doc_id,
        text_fingerprint(text) AS fp,
        subword_count(text) AS n_subwords,
        size(word_shingles(text, 3, true)) AS n_shingles
      FROM documents_fn ORDER BY doc_id""")
  }

  /** PARAMETERIZED SQL (the `spark.sql(text, args)` named-parameter
    * binding, Spark ≥3.4): the query text carries `:minQty`/`:cutoff`
    * placeholders and the values bind at plan time — the injection-
    * safe templated-query API a serving layer calls with user input.
    * The oracle inlines the same literals. */
  private def qSqlParams(implicit s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_params")
    s.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem_params
        |WHERE l_quantity >= :minQty AND l_shipdate < CAST(:cutoff AS TIMESTAMP)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      Map("minQty" -> 30, "cutoff" -> "1997-01-01 00:00:00"))
  }

  private val qSqlParamsSql =
    """SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(28,2))), 2) AS DOUBLE)
      |    AS revenue
      |FROM lineitem
      |WHERE l_quantity >= 30 AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private val qSqlFunctionsSql =
    s"""SELECT doc_id,
       |  ${TextFns.fingerprintSql("text")} AS fp,
       |  CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'),
       |    w -> 1 + length(w) // 6), 'sum') AS BIGINT) AS n_subwords,
       |  CAST(len(list_distinct(CASE
       |    WHEN len(string_split_regex(trim(text), '\\s+')) < 3
       |      THEN [array_to_string(string_split_regex(trim(text), '\\s+'), ' ')]
       |    ELSE list_transform(range(1, len(string_split_regex(trim(text), '\\s+')) - 1),
       |      i -> array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), i, i + 2), ' '))
       |  END)) AS INTEGER) AS n_shingles
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus-trained bigram LM score per document: pass 1 counts word
    * bigrams over the whole corpus (one shuffle); pass 2 scores each
    * document by its mean log(1 + corpus count) over its bigrams
    * (broadcast-joinable count table at realistic vocabularies, since
    * the bigram table is sublinear in corpus size). A deterministic
    * stand-in for perplexity-style quality filtering — rounded before
    * output because the per-doc sum is a grouped double fold. */
  private def qBigramLmScore(implicit s: SparkSession, dir: String): DataFrame = {
    val bigrams = docs.select(col("doc_id"),
      explode(TextFns.shingles(col("text"), 2)).as("bg"))
    val counts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c"))
    bigrams.join(counts, "bg")
      .groupBy(col("doc_id"))
      .agg(round(sum(log(col("c") + 1.0)) / count(lit(1)), 6).as("lm_score"),
        count(lit(1)).as("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  private val qBigramLmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
      |    ELSE list_transform(range(1, len(t)),
      |           i -> array_to_string(list_slice(t, i, i + 1), ' ')) END) AS bg
      |  FROM toks),
      |counts AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg)
      |SELECT doc_id,
      |  round(SUM(ln(c + 1.0)) / COUNT(*), 6) AS lm_score,
      |  COUNT(*) AS n_bigrams
      |FROM bg JOIN counts USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Distributed word count, top-20 — explode to tokens, grouped
    * count, TakeOrderedAndProject (at 100 TB the explode is a narrow
    * map and the count is one shuffle on the word). */
  /** Exact corpus heavy hitters (count > N/200) via per-partition
    * Misra–Gries candidates + broadcast exact recount — no vocabulary
    * shuffle (see [[graft.operators.HeavyHitters]]). The oracle
    * replays the plain GROUP BY … HAVING cnt·k > N form, which the
    * sketch-then-verify composition equals exactly. */
  private def qHeavyHitters(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.HeavyHitters.exact(
        docs.select(explode(TextFns.tokens(col("text"))).as("word")),
        "word", k = 200)
      .orderBy(col("cnt").desc, col("word"))

  private val qHeavyHittersSql =
    """WITH words AS (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents)
      |SELECT word, COUNT(*) AS cnt FROM words GROUP BY word
      |HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM words)
      |ORDER BY cnt DESC, word""".stripMargin

  private def qWordcountTopk(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(explode(TextFns.tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  private val qWordcountTopkSql =
    """SELECT word, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      |  FROM documents)
      |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin

  /** The same word count through the custom Generator (UDTF surface):
    * `shingle_explode(text, 1)` streams one token-row at a time
    * instead of materializing the token array per document — same
    * oracle as q_wordcount_topk. */
  private def qWordcountGen(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(graft.plans.ShingleExplode(col("text"), 1).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  // ------------------------------------------ inverted index + BM25
  /** Inverted-index build: per term df, cf, and the exact top-5
    * postings by (tf DESC, doc ASC) — truncated WITHOUT a per-term
    * window over raw postings (per-partition bounded heap + window
    * over the ≤ partitions·P candidates; see
    * [[graft.operators.TextIndex.topPostingsPerTerm]]). The oracle
    * replays the plain single-window form — the hash gate is the
    * proof the sketch-then-rank composition equals it. */
  private val IdxTopP = 5
  private def qIndexInverted(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.invertedIndex(docs, "doc_id", "text", IdxTopP)
      .orderBy(col("word"))

  private val qIndexInvertedSql =
    s"""WITH w AS (
       |  SELECT doc_id AS doc, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents),
       |tf AS (SELECT word, doc, count(*) AS tf FROM w GROUP BY 1, 2),
       |stats AS (
       |  SELECT word, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
       |  FROM tf GROUP BY 1),
       |top AS (
       |  SELECT word, doc, tf,
       |    row_number() OVER (PARTITION BY word ORDER BY tf DESC, doc) AS rk
       |  FROM tf),
       |p AS (
       |  SELECT word, string_agg(doc || ':' || tf, ',' ORDER BY rk) AS postings
       |  FROM top WHERE rk <= $IdxTopP GROUP BY word)
       |SELECT s.word, s.df, s.cf, p.postings
       |FROM stats s JOIN p USING (word) ORDER BY s.word""".stripMargin

  /** BM25 top-10 for a fixed bag-of-terms query: rational idf (N/df,
    * the TF-IDF operator's convention — transcendental-free so both
    * engines compute the identical double), per-(doc, term)
    * contribution rounded then DECIMAL-summed per doc (exact,
    * order-independent). Corpus stats broadcast; the term filter
    * prunes the scan before any shuffle. */
  private val Bm25Terms = Seq("data", "join", "stream")
  private val Bm25K1 = 1.2
  private val Bm25B  = 0.75
  private def qBm25TopK(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.TextIndex.bm25TopK(docs, "doc_id", "text",
      Bm25Terms, Bm25K1, Bm25B, topK = 10)

  private val qBm25TopKSql = bm25Sql(topK = 10)

  /** DuckDB BM25 twin, parameterized by topK — shared by
    * `q_bm25_topk` (10) and the hybrid-RRF sparse leg (20). */
  private def bm25Sql(topK: Int): String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id AS doc, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents),
       |tf AS (SELECT word, doc, count(*) AS tf FROM w GROUP BY 1, 2),
       |dl AS (
       |  SELECT doc_id AS doc,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats AS (
       |  SELECT CAST(SUM(CAST(dl AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS avgdl,
       |    CAST(COUNT(*) AS DOUBLE) AS n FROM dl),
       |m AS (SELECT * FROM tf WHERE word IN ($terms)),
       |df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM m GROUP BY 1),
       |c AS (
       |  SELECT m.doc, round(
       |    (stats.n / df.df) * (CAST(m.tf AS DOUBLE) * ${Bm25K1 + 1.0})
       |      / (CAST(m.tf AS DOUBLE)
       |         + ${Bm25K1} * (${1.0 - Bm25B} + ${Bm25B} * dl.dl / stats.avgdl)),
       |    6) AS c
       |  FROM m JOIN df USING (word) JOIN dl ON dl.doc = m.doc CROSS JOIN stats)
       |SELECT doc, round(CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE), 6) AS score
       |FROM c GROUP BY doc ORDER BY score DESC, doc LIMIT $topK""".stripMargin
  }

  // ------------------------------------------------ hybrid retrieval (RRF)
  /** Hybrid retrieval: the sparse (BM25 top-20) and dense (brute-force
    * cosine top-20 for probe vector 0) result lists fused by
    * reciprocal-rank fusion, rrf(d) = Σ_lists 1/(60 + rank_d) —
    * the standard fusion rule (Cormack et al., SIGIR'09) and the shape
    * every RAG stack runs when a corpus carries both an inverted index
    * and an embedding index. Ranks are INTEGERS from the two top-k
    * operators (each deterministic by (score DESC, id)), so the fusion
    * arithmetic is two exact divisions and one add — bit-identical
    * across engines with no rounding recipe needed (rounded to 9 dp
    * only to fix the output format).
    *
    * Scale posture: each leg is an already-scale-audited operator
    * (BM25: term-filtered postings + broadcast stats; dense: broadcast
    * probe); the fusion itself joins two ≤k-row lists — the window
    * ranking the sparse leg runs is over the ALREADY-SELECTED top-k
    * frame, never the corpus. */
  private val RrfC = 60
  private val RrfFuseK = 20

  private def qHybridRrf(implicit s: SparkSession, dir: String): DataFrame = {
    val sparse = graft.operators.TextIndex.bm25TopK(docs, "doc_id", "text",
      Bm25Terms, Bm25K1, Bm25B, topK = RrfFuseK)
    // rank over the ≤20-row top-k frame via the window-free small-
    // frame ranker (no empty-partition Window anywhere in the engine)
    val sRank = graft.operators.Selection
      .rankSmallFrameDesc(sparse.select(col("doc"), col("score")),
        "score", "doc", "rank_sparse")
      .select(col("doc").as("id"), col("rank_sparse"))
    val dense = Similarity.bruteForceTopKSingle(
        embs.where(col("vec_id") === 0), embs,
        "vec_id", "vec_id", "embedding", RrfFuseK)
      .select(col("vec_id").as("id"), col("rk").as("rank_dense"))
    sRank.join(dense, Seq("id"), "full_outer")
      .select(col("id"), col("rank_sparse"), col("rank_dense"),
        round(
          coalesce(lit(1.0) / (lit(RrfC) + col("rank_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfC) + col("rank_dense")), lit(0.0)),
          9).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(15)
  }

  private val qHybridRrfSql =
    s"""WITH bm AS (${bm25Sql(topK = RrfFuseK).replace("\n", "\n  ")}),
       |sparse AS (
       |  SELECT doc AS id, CAST(row_number() OVER (
       |    ORDER BY score DESC, doc) AS INTEGER) AS rank_sparse FROM bm),
       |scored AS (
       |  SELECT c.vec_id AS id,
       |    $cosineSqlExpr AS sim
       |  FROM (SELECT * FROM embeddings WHERE vec_id = 0) q
       |  CROSS JOIN embeddings c WHERE q.vec_id <> c.vec_id),
       |dense AS (
       |  SELECT id, rank_dense FROM (
       |    SELECT id, CAST(row_number() OVER (
       |      ORDER BY sim DESC, id) AS INTEGER) AS rank_dense FROM scored)
       |  WHERE rank_dense <= $RrfFuseK)
       |SELECT coalesce(s.id, d.id) AS id, rank_sparse, rank_dense,
       |  round(coalesce(1.0 / ($RrfC + rank_sparse), 0.0)
       |      + coalesce(1.0 / ($RrfC + rank_dense), 0.0), 9) AS rrf
       |FROM sparse s FULL JOIN dense d ON s.id = d.id
       |ORDER BY rrf DESC, id LIMIT 15""".stripMargin

  // ------------------------------------------------ n-gram novelty score
  /** Per-document n-gram NOVELTY: the fraction of a document's
    * distinct 3-shingles that occur in exactly one duplicate FAMILY
    * corpus-wide — the "how much of this text exists nowhere else"
    * quality signal (the inverse of boilerplate), scored per document
    * for filtering or mixture weighting.
    *
    * Family-collapsed by construction: shingling and the census run
    * over DISTINCT texts (exact-duplicate families), so a K×-replicated
    * corpus pays the shingle work once per family, never per copy —
    * the same collapse-first posture as the `_scalable` dedups — and
    * every member of a family inherits its family's novelty via a
    * 16-byte digest join (never a second full-text shuffle). Shingle
    * ids are the md5-h15 scheme: no vocabulary, bit-replayable. */
  private def qNgramNovelty(implicit s: SparkSession, dir: String): DataFrame = {
    val fam = graft.core.Caches.track(
      docs.groupBy(col("text")).agg(min(col("doc_id")).as("fam_id"))
        .select(md5(col("text")).as("_dig"), col("fam_id"), col("text")))
    val famWids = graft.core.Caches.track(docWids(
        fam.select(col("fam_id").as("doc_id"),
          TextFns.shinglesDistinct(col("text"), 3).as("shset")))
      .distinct()) // wid collisions inside one family fold to one row
    // a novel wid (nf = 1) has exactly one (fam, wid) row, so min(fam)
    // IS its owner: attributing novelty through the census aggregate
    // replaces the corpus-sized famWids ⋈ census wid-join + re-shuffle
    // with one fam-sized aggregate over the census's nf = 1 slice
    val novel = famWids.groupBy(col("wid"))
      .agg(count(lit(1)).as("nf"), min(col("doc_id")).as("_owner"))
      .where(col("nf") === 1)
      .groupBy(col("_owner").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    val perFam = famWids.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id").as("fam_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
    docs.select(col("doc_id"), md5(col("text")).as("_dig"))
      .join(fam.select(col("_dig"), col("fam_id")), Seq("_dig"))
      .join(perFam, Seq("fam_id"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel") / col("n_shingles"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  private val qNgramNoveltySql =
    s"""WITH fam AS (
       |  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |${shingleCtesFrom("fam")},
       |dw AS (SELECT DISTINCT doc_id, wid FROM docw),
       |census AS (SELECT wid, COUNT(*) AS nf FROM dw GROUP BY 1),
       |perfam AS (
       |  SELECT dw.doc_id AS fam_id, COUNT(*) AS n_shingles,
       |    CAST(SUM(CASE WHEN c.nf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM dw JOIN census c USING (wid) GROUP BY 1)
       |SELECT d.doc_id, p.n_shingles, p.n_novel,
       |  round(p.n_novel / p.n_shingles, 6) AS novelty
       |FROM documents d
       |JOIN fam f ON f.text = d.text
       |JOIN perfam p ON p.fam_id = f.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------ count-min sketch
  /** Count–min frequency sketch over corpus words, d=3 rows × w=16
    * buckets — deliberately undersized so collisions are REAL at
    * fixture scale and the one-sided error (est ≥ exact) is a live
    * invariant, not a vacuous one. The whole sketch is md5-bucketed
    * and therefore bit-replayable by the oracle; the `overest` column
    * is the per-word excess the DuckDB replay must reproduce exactly.
    * ([[graft.operators.Sketches]] — frequency answers WITHOUT a
    * vocabulary-sized table; the exact join here exists to gate the
    * invariant, production serves estimates straight from the d·w
    * grid.) */
  private val CmsD = 3
  private val CmsW = 16
  private def qSketchCms(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sketches
    val words = docs.select(explode(TextFns.tokens(col("text"))).as("word"))
    val counters = Sketches.cmsCounters(words, "word", CmsD, CmsW)
    val vocab = words.groupBy(col("word")).agg(count(lit(1)).as("exact"))
    Sketches.cmsEstimate(counters, vocab.select(col("word")), "word", CmsD, CmsW)
      .join(vocab, "word")
      .select(col("word"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overest"))
      .orderBy(col("word"))
  }

  private val qSketchCmsSql = {
    import graft.operators.Sketches
    val builds = (0 until CmsD).map(r =>
      s"SELECT $r AS r, ${Sketches.cmsBucketSql("word", r, CmsW)} AS bucket FROM words")
      .mkString("\n    UNION ALL ")
    val probes = (0 until CmsD).map(r =>
      s"""SELECT v.word, c.cnt FROM vocab v JOIN cells c
         |      ON c.r = $r AND c.bucket = ${Sketches.cmsBucketSql("v.word", r, CmsW)}""".stripMargin)
      .mkString("\n    UNION ALL ")
    s"""WITH words AS (
       |  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents),
       |cells AS MATERIALIZED (
       |  SELECT r, bucket, COUNT(*) AS cnt FROM (
       |    $builds)
       |  GROUP BY 1, 2),
       |vocab AS MATERIALIZED (
       |  SELECT word, COUNT(*) AS exact FROM words GROUP BY 1),
       |est AS (
       |  SELECT word, MIN(cnt) AS est FROM (
       |    $probes)
       |  GROUP BY 1)
       |SELECT v.word, v.exact, e.est, e.est - v.exact AS overest
       |FROM vocab v JOIN est e ON e.word = v.word
       |ORDER BY v.word""".stripMargin
  }

  // --------------------------------------------- TextRank keywords
  /** TextRank corpus keywords: weighted PageRank over the word
    * co-occurrence graph, 10 damped rounds replayed exactly by the
    * oracle ([[graft.operators.TextRank]] scaladoc — the QualityModel
    * decimal-exactness recipe applied to graph iteration; iteration
    * state is vocab-sized, never corpus-sized). */
  private val TrDamping = 0.85
  private val TrIters = 10
  private def qTextRank(implicit s: SparkSession, dir: String): DataFrame =
    graft.operators.TextRank.textRank(docs, "text", TrDamping, TrIters)
      .select(col("word"), round(col("r"), 6).as("rank"))
      .orderBy(col("rank").desc, col("word"))
      .limit(10)

  private val qTextRankSql =
    graft.operators.TextRank.textRankSql("documents", "text",
      TrDamping, TrIters, topK = 10)

  private def qFingerprint(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"), TextFns.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  private val qFingerprintSql =
    s"""SELECT doc_id, ${TextFns.fingerprintSql("text")} AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------- scalable composed path
  /** MinHash+LSH composed the way production dedup runs: exact-collapse
    * first (one hash groupBy), then near-dup over the representatives
    * ([[Dedup.nearDupPairsAfterExact]]). Oracle-EXACT since the md5-h15
    * shingle ids: DuckDB replays the identical pipeline over the same
    * `reps` relation — the 100 TB path and the gated path are now the
    * same code. */
  private def qDedupMinhashScalable(implicit s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairsAfterExact(docs, "doc_id", "text", n = 3, k = 12,
        bands = 4, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  private val qDedupMinhashScalableSql = minhashSqlOver(
    "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
    "reps")

  // --------------------------------------------- near-dup CLUSTERS
  /** Pair→GROUP resolution: the scalable composed path's candidate
    * pairs run through iterative smallest-id label propagation
    * ([[Dedup.connectedComponents]]), emitting one row per clustered
    * representative with its keeper and cluster size — the actual
    * keep/drop decision surface of a corpus dedup (pair A–B + B–C →
    * one keeper for {A,B,C}). Oracle-exact: DuckDB replays the
    * propagation as a recursive reachability CTE over the SAME
    * `pairs` relation (min over reachable ids ≡ converged min-label). */
  private def qDedupClusters(implicit s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupClusters(docs, "doc_id", "text", n = 3, k = 12,
        bands = 4, threshold = 0.5)
      .orderBy(col("keeper"), col("doc_id"))

  private val qDedupClustersSql =
    s"""WITH RECURSIVE ${minhashPairCtes(
          "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
          "reps")},
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
       |lab AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
       |sz AS (SELECT comp, COUNT(*) AS cluster_size FROM lab GROUP BY comp)
       |SELECT lab.id AS doc_id, lab.comp AS keeper, sz.cluster_size
       |FROM lab JOIN sz USING (comp)
       |ORDER BY keeper, doc_id""".stripMargin

  // ---------------------------------------------- incremental dedup
  /** Daily-ingest dedup gate: documents split into a persisted CORPUS
    * (doc_id % 10 ≠ 0) and a new DELTA (doc_id % 10 = 0); the delta is
    * deduped against the corpus's persisted banded signatures plus
    * itself ([[Dedup.incrementalNearDupPairs]] — corpus never
    * recomputed, never shuffled, delta broadcast). Oracle-exact via
    * the restriction identity: the incremental result must equal the
    * FULL corpus+delta run's pairs restricted to pairs touching the
    * delta. */
  private def qDedupIncremental(implicit s: SparkSession, dir: String): DataFrame = {
    val all = docs.select(col("doc_id"), col("text"))
    val delta = all.where(col("doc_id") % 10 === 0)
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    val corpusBanded = Dedup.bandedSignatures(corpus, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val newBanded = Dedup.bandedSignatures(delta, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val allSets = graft.core.Caches.track(
      Dedup.shingleSets(all, "doc_id", "text", n = 3))
    Dedup.incrementalNearDupPairs(newBanded, corpusBanded, allSets, "doc_id")
      .orderBy(col("id_a"), col("id_b"))
  }

  private val qDedupIncrementalSql =
    s"""WITH ${minhashPairCtes("", "documents")}
       |SELECT id_a, id_b, jaccard FROM pairs
       |WHERE id_a % 10 = 0 OR id_b % 10 = 0
       |ORDER BY id_a, id_b""".stripMargin

  /** The PERSISTED-store lifecycle gated end to end: the corpus's
    * banded signatures and shingle sets are written as REAL bucketed
    * on-disk tables ([[Dedup.SignatureStore]], bucketed by the probe's
    * join keys), read back from disk, and probed by the delta through
    * the sort-merge shape the layout exists for — zero Exchange on the
    * store side (plan-asserted in DedupSpec). Same restriction-identity
    * oracle as [[qDedupIncremental]]: splitting persisted-corpus vs
    * delta cannot change any pair. The store is written once per JVM
    * per sf dir (the lifecycle's point — persist once, probe daily);
    * the gated read path always comes FROM DISK. */
  private def qDedupIncrementalStore(implicit s: SparkSession, dir: String): DataFrame = {
    val all = docs.select(col("doc_id"), col("text"))
    val delta = all.where(col("doc_id") % 10 === 0)
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    Dedup.SignatureStore.writeOnce(s, corpus, "doc_id", "text", tag,
      n = 3, k = MhK, bands = MhBands)
    val newBanded = Dedup.bandedSignatures(delta, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val allSets = Dedup.SignatureStore.sets(s, tag)
      .unionByName(Dedup.shingleSets(delta, "doc_id", "text", n = 3))
    Dedup.incrementalNearDupPairsFromStore(newBanded,
        Dedup.SignatureStore.banded(s, tag), allSets, "doc_id")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DAY-2 of the persisted-store lifecycle — the daily-cron loop
    * closed end to end: day-0 corpus (doc_id % 10 ∉ {0, 5}) persisted
    * as bucketed tables → day-1 delta (% 10 = 5) absorbed via
    * [[Dedup.SignatureStore.absorb]] (merge + RE-PERSIST bucketed
    * under a new tag) → day-2 delta (% 10 = 0) probed against the
    * RE-PERSISTED store read back from disk. The re-persisted layout
    * is identical to day 0's, so the day-2 probe plans the same
    * zero-store-side-Exchange sort-merge (plan-asserted in DedupSpec).
    * Oracle: the corpus after day 1 is exactly "everything but the
    * % 10 = 0 delta", so day-2 incremental pairs must equal the FULL
    * run restricted to delta-touching pairs — the same restriction
    * identity (and the same SQL) as [[qDedupIncremental]], now
    * reached through two generations of persisted store. */
  private def qDedupStoreDay2(implicit s: SparkSession, dir: String): DataFrame = {
    val all = docs.select(col("doc_id"), col("text"))
    val day0 = all.where(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val delta1 = all.where(col("doc_id") % 10 === 5)
    val delta2 = all.where(col("doc_id") % 10 === 0)
    val hex = java.lang.Integer.toHexString(dir.hashCode)
    val (tag0, tag1) = (s"${hex}_d0", s"${hex}_d1")
    Dedup.SignatureStore.writeOnce(s, day0, "doc_id", "text", tag0,
      n = 3, k = MhK, bands = MhBands)
    Dedup.SignatureStore.absorbOnce(s, tag0, tag1, delta1, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val newBanded = Dedup.bandedSignatures(delta2, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val allSets = Dedup.SignatureStore.sets(s, tag1)
      .unionByName(Dedup.shingleSets(delta2, "doc_id", "text", n = 3))
    Dedup.incrementalNearDupPairsFromStore(newBanded,
        Dedup.SignatureStore.banded(s, tag1), allSets, "doc_id")
      .orderBy(col("id_a"), col("id_b"))
  }

  /** GROUP-RESOLUTION read off the persisted signature store — the
    * id-keyed consumer the `sets` table's id-bucketing exists for
    * (promised in [[Dedup.SignatureStore]]'s scaladoc since r8, landed
    * here): pick the store's largest LSH bucket (the banded table is
    * bucketed by exactly that grouping key, so the bucket census plans
    * ZERO Exchange), then fetch its members' shingle sets through a
    * BUCKET-PRUNED scan of `sets` (SelectedBucketsCount < total,
    * plan-asserted in DedupSpec) and report each member's shingle
    * count and Jaccard to the group representative. At 100 TB this is
    * the "show me this duplicate cluster" read a curation UI issues —
    * it touches only the buckets the member ids hash to, never scans
    * or shuffles the store. Oracle: DuckDB replays bands, picks the
    * same bucket (count DESC, band, bsig), and recomputes both
    * measures from the shingle CTEs. */
  private def qDedupGroupResolve(implicit s: SparkSession, dir: String): DataFrame = {
    val all = docs.select(col("doc_id"), col("text"))
    val tag = java.lang.Integer.toHexString(dir.hashCode) + "_gr"
    Dedup.SignatureStore.writeOnce(s, all, "doc_id", "text", tag,
      n = 3, k = MhK, bands = MhBands)
    Dedup.SignatureStore.resolveLargestGroup(s, tag, "doc_id")
  }

  private val qDedupGroupResolveSql =
    s"""WITH ${minhashPairCtes("", "documents")},
       |grp AS (SELECT band, bsig FROM banded GROUP BY band, bsig
       |        ORDER BY COUNT(*) DESC, band, bsig LIMIT 1),
       |members AS (SELECT DISTINCT b.doc_id FROM banded b
       |  JOIN grp g ON b.band = g.band AND b.bsig = g.bsig),
       |rep AS (SELECT s.shset AS rep_set FROM sets s
       |  WHERE s.doc_id = (SELECT MIN(doc_id) FROM members))
       |SELECT m.doc_id, CAST(len(s.shset) AS BIGINT) AS n_shingles,
       |  round(CAST(len(list_intersect(s.shset, rep.rep_set)) AS DOUBLE)
       |    / len(list_distinct(list_concat(s.shset, rep.rep_set))), 6) AS jaccard_rep
       |FROM members m JOIN sets s ON m.doc_id = s.doc_id CROSS JOIN rep
       |ORDER BY m.doc_id""".stripMargin

  /** The persisted store probed from a STREAM — ingestion-time dedup:
    * delta documents arrive as micro-batches and each batch is
    * LSH-probed against the same bucketed on-disk store
    * [[qDedupIncrementalStore]] persists (shared tag — `writeOnce`
    * builds it exactly once per JVM). Emits STREAM×STORE pairs only,
    * so the result is batch-boundary-invariant and a batch SQL oracle
    * gates the streaming run exactly: the full run's pairs restricted
    * to pairs with EXACTLY ONE delta side (the XOR restriction —
    * internal delta pairs are [[qDedupIncrementalStore]]'s half). */
  private def qStreamDedupStore(implicit s: SparkSession, dir: String): DataFrame = {
    val all = docs.select(col("doc_id"), col("text"))
    val corpus = all.where(col("doc_id") % 10 =!= 0)
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    Dedup.SignatureStore.writeOnce(s, corpus, "doc_id", "text", tag,
      n = 3, k = MhK, bands = MhBands)
    graft.streaming.EventStreams.streamingStoreProbe(s, dir, tag,
        n = 3, k = MhK, bands = MhBands)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** COLLAPSE-FIRST twin (r14): the naive per-id replay (LSH CTEs
    * over every document) explodes in DuckDB at big rungs — at sf100
    * each 1000-copy family shares every band bucket, so the banded
    * self-join materializes billions of candidate rows and spilled
    * > 64 GB twice (PROFILE_r13 §10). Identical texts have identical
    * signatures, so id-level LSH candidacy and jaccard are functions
    * of the TEXT alone: run the full MinHash chain over DISTINCT
    * texts (scale-invariant, ~5 k rows at every rung), then expand
    * arithmetically — same-family id pairs at jaccard 1.0, rep-level
    * near-dup pairs fanned out to every copy combination. Exactly the
    * engine's collapse-first production posture, replayed in SQL. */
  private val qStreamDedupStoreSql =
    s"""WITH ${minhashPairCtes(
          "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
          "reps")},
       |fams AS (SELECT d.doc_id, r.doc_id AS rep FROM documents d
       |  JOIN reps r ON r.text = d.text),
       |cross_fam AS (
       |  SELECT CASE WHEN a.doc_id < b.doc_id THEN a.doc_id ELSE b.doc_id END AS id_a,
       |         CASE WHEN a.doc_id < b.doc_id THEN b.doc_id ELSE a.doc_id END AS id_b,
       |         p.jaccard
       |  FROM pairs p JOIN fams a ON a.rep = p.id_a JOIN fams b ON b.rep = p.id_b),
       |same_fam AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
       |  FROM fams a JOIN fams b ON a.rep = b.rep AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT * FROM cross_fam UNION ALL SELECT * FROM same_fam)
       |WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------- full curation pipeline
  /** The whole "curate a corpus" flow in ONE query — what a training-
    * data pipeline actually runs end to end: exact dedup (smallest-id
    * representative per identical text) → MinHash+LSH near-dup pairs →
    * connected-component cluster resolution → drop every non-keeper
    * cluster member → quality-score the survivors → per-language
    * middle-quality percentile band (small-group passthrough) → stride
    * sample 5 per language. Oracle-exact end to end: every stage has a
    * proven DuckDB twin (recursive reachability CTE for the
    * propagation, quantile_cont band, rn/step stride arithmetic). */
  private def qCuratePipeline(implicit s: SparkSession, dir: String): DataFrame =
    Selection.strideSample(curatedBand, "lang", "doc_id", 5)
      .select(col("lang"), col("doc_id"), col("quality"))
      .orderBy(col("lang"), col("doc_id"))

  /** The curation flow through the quality band — the curated corpus
    * itself (deduped, cluster-resolved, middle-quality). Shared by
    * [[qCuratePipeline]] (which stride-samples it) and [[qCurateSink]]
    * (which PERSISTS it — the table a production run actually writes). */
  private def curatedBand(implicit s: SparkSession, dir: String): DataFrame = {
    val reps = Dedup.exactDedup(
      docs.select(col("doc_id"), col("text"), col("lang")), "doc_id", Seq("text"))
    val pairs = Dedup.nearDupPairs(
      reps.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, k = MhK, bands = MhBands, threshold = 0.5)
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dropIds = comps.where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val curated = reps.join(dropIds, Seq("doc_id"), "left_anti")
    val scored = curated.select(col("doc_id"), col("lang"),
      TextFns.qualityScore(col("text")).as("quality"))
    Selection.percentileBand(scored, "lang", "quality",
      0.25, 0.75, minGroupSize = 20)
  }

  /** Production sink for the curated corpus: [[curatedBand]] written
    * as parquet `partitionBy(lang)` — the layout training reads want —
    * then read back FROM DISK restricted to one language. The
    * restriction is satisfied by PARTITION pruning (directory-level
    * file listing, not per-row filtering: PartitionPruningSpec asserts
    * PartitionFilters on this very query's plan), so a 100 TB curated
    * lake serves a one-language training job by reading one
    * directory. Oracle-exact sink → scan → restrict round trip: the
    * read-back must equal the band stage restricted to the same
    * language, value-for-value through the parquet round trip. */
  private def qCurateSink(implicit s: SparkSession, dir: String): DataFrame = {
    // the WRITE is this query's semantics (sink → scan round trip),
    // so it stays inside the query; only the path moved to the
    // collision-free pid-scoped scratch root
    val out = graft.core.Scratch.pathFor("curated_sink", dir)
    // cluster by the partition column before the partitioned write
    // (guide §6), SALTED within it (guide §2.5): languages are few and
    // Zipfian, so repartition(lang) alone would plan ONE task holding
    // the majority language at corpus scale (r14 verdict #2). The
    // deterministic doc_id salt bounds the largest language to
    // ~1/[[SinkSaltBuckets]] of its bytes per write task while keeping
    // files clustered per lang directory; AQE partition coalescing
    // collapses the near-empty salt cells at fixture scale, so small
    // corpora still get few files per lang.
    curatedBand.select(col("doc_id"), col("quality"), col("lang"))
      .repartition(col("lang"),
        pmod(xxhash64(col("doc_id")), lit(SinkSaltBuckets)))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .where(col("lang") === "en")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Oracle CTE chain through the `band` stage — the DuckDB twin of
    * [[curatedBand]], shared by the pipeline and sink oracles. */
  private val curateBandCtes = {
    val (_, _, quality) = qualitySqlBits
    s"""${minhashPairCtes(
          "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
          "reps")},
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
       |lab AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
       |curated AS (
       |  SELECT r.doc_id, d.lang, d.text
       |  FROM reps r JOIN documents d ON d.doc_id = r.doc_id
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM lab WHERE lab.id = r.doc_id AND lab.comp <> r.doc_id)),
       |scored AS (SELECT doc_id, lang, $quality AS quality FROM curated),
       |th AS (
       |  SELECT lang, quantile_cont(quality, 0.25) AS lo,
       |         quantile_cont(quality, 0.75) AS hi, count(*) AS n
       |  FROM scored GROUP BY lang),
       |band AS (
       |  SELECT s.doc_id, s.lang, s.quality
       |  FROM scored s JOIN th ON s.lang = th.lang
       |  WHERE th.n < 20 OR (s.quality >= th.lo AND s.quality <= th.hi))""".stripMargin
  }

  private val qCuratePipelineSql =
    s"""WITH RECURSIVE $curateBandCtes,
       |rn AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
       |         count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM band)
       |SELECT lang, doc_id, quality FROM (
       |  SELECT *, greatest(cnt // 5, 1) AS step FROM rn)
       |WHERE cnt <= 5 OR ((rn - 1) % step = 0 AND (rn - 1) // step < 5)
       |ORDER BY lang, doc_id""".stripMargin

  private val qCurateSinkSql =
    s"""WITH RECURSIVE $curateBandCtes
       |SELECT doc_id, lang, quality FROM band
       |WHERE lang = 'en' ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ curation funnel
  /** Per-stage retention accounting for the curation DAG — the
    * observability artifact every production pipeline publishes next
    * to its output: how many documents survived raw → exact-dedup
    * representatives → cluster keepers → quality band. A silent
    * collapse at any stage (a bad threshold dropping 99% of a
    * language, an over-eager dedup) is invisible in the curated
    * output itself and obvious in the funnel. Oracle-exact: DuckDB
    * replays the same stage CTEs and counts the same frames.
    *
    * Scale posture: each count is a metadata-sized aggregate over a
    * stage that is already scale-shaped (the DAG's own operators),
    * and the intermediate counts ride the band evaluation itself as
    * OBSERVED metrics (r15): the reps and keeper counts are collected
    * on the rows already flowing through the anti-join during the one
    * band pass, so the funnel pays exactly one traversal of the chain
    * plus a parquet-footer count of the raw table — no per-stage
    * re-scan aggregates, no new shuffles beyond the DAG's own. */
  private def qCurateFunnel(implicit s: SparkSession, dir: String): DataFrame = {
    val reps = graft.core.Caches.track(Dedup.exactDedup(
      docs.select(col("doc_id"), col("text"), col("lang")), "doc_id", Seq("text")))
    val pairs = Dedup.nearDupPairs(
      reps.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, k = MhK, bands = MhBands, threshold = 0.5)
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val dropIds = comps.where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val oReps = org.apache.spark.sql.Observation()
    val oCur = org.apache.spark.sql.Observation()
    val curated = graft.core.Caches.track(
      reps.toDF.observe(oReps, count(lit(1)).as("n"))
        .join(dropIds, Seq("doc_id"), "left_anti")
        .observe(oCur, count(lit(1)).as("n")))
    val scored = curated.select(col("doc_id"), col("lang"),
      TextFns.qualityScore(col("text")).as("quality"))
    val band = Selection.percentileBand(scored, "lang", "quality",
      0.25, 0.75, minGroupSize = 20)
    // ONE pass: counting the band materializes the cached chain and
    // fires both in-flight metrics (every reps row crosses the
    // anti-join input; every keeper row crosses its output). The raw
    // count is a parquet metadata aggregate. Fallbacks recount from
    // the by-then-materialized caches — the pre-r15 cost.
    val nBand = band.count()
    val nDocs = docs.count()
    val nReps = graft.core.Observed.longOr(oReps, "n", reps.toDF)
    val nCur = graft.core.Observed.longOr(oCur, "n", curated)
    import s.implicits._
    Seq("0_raw" -> nDocs, "1_exact_reps" -> nReps,
        "2_cluster_keepers" -> nCur, "3_quality_band" -> nBand)
      .toDF("stage", "n_docs")
      .orderBy(col("stage"))
  }

  private val qCurateFunnelSql =
    s"""WITH RECURSIVE $curateBandCtes
       |SELECT stage, n_docs FROM (
       |  SELECT '0_raw' AS stage, COUNT(*) AS n_docs FROM documents
       |  UNION ALL SELECT '1_exact_reps', COUNT(*) FROM reps
       |  UNION ALL SELECT '2_cluster_keepers', COUNT(*) FROM curated
       |  UNION ALL SELECT '3_quality_band', COUNT(*) FROM band)
       |ORDER BY stage""".stripMargin

  // --------------------------------------- leakage-safe split
  /** Train/val/test split that can NEVER leak near-duplicates across
    * splits — the eval-integrity op a training pipeline runs before
    * publishing a benchmark split (a doc-level hash split puts two
    * near-identical documents on opposite sides of the train/test
    * fence, and the model "generalizes" to its own training data).
    * Every document maps to its duplicate FAMILY root — exact-dup
    * families collapse to their min-id representative, near-dup reps
    * union into connected components — and the 80/10/10 decision
    * hashes the ROOT, not the doc, so a family lands in exactly one
    * split by construction. Report: docs + families per split, plus
    * a `straddling` column the oracle computes INDEPENDENTLY (families
    * seen in >1 split — must be 0).
    *
    * Scale posture: the family map is the dedup tier's own machinery
    * (one grouped min for exact families, LSH + edge-list CC for
    * near-dups — never all-pairs); the split decision is a per-row
    * seeded md5 over the root, shuffle-free and stable under
    * repartitioning, exactly like `q_train_val_split`'s per-doc rule. */
  /** The per-doc (doc_id, family, split) assignment behind
    * [[qSplitLeakageSafe]] — exposed for TrainHygieneSpec, which
    * asserts the leakage property directly on near-dup pairs. */
  private[graft] def leakageSafeAssignment(spark: SparkSession,
                                           sfDir: String): DataFrame = {
    implicit val s: SparkSession = spark
    implicit val dir: String = sfDir
    val d = docs.select(col("doc_id"), col("text"))
    // exact families keyed by md5 digest for the doc→rep join: the
    // grouping itself must shuffle full text once (it IS the key),
    // but the join back shuffles 16-byte digests instead of paying a
    // second full-text shuffle — the same digest-family convention as
    // q_curate_incremental (collision odds 2^-128, and the oracle
    // would catch one)
    val fam = graft.core.Caches.track(
      d.groupBy(col("text")).agg(min(col("doc_id")).as("rep"))
        .select(md5(col("text")).as("_dig"), col("rep"), col("text")))
    val reps = fam.select(col("rep").as("doc_id"), col("text"))
    val pairs = Dedup.nearDupPairs(reps, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands, threshold = 0.5)
    val comps = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val rooted = d.select(col("doc_id"), md5(col("text")).as("_dig"))
      .join(fam.select(col("_dig"), col("rep")), Seq("_dig"))
      .join(comps.withColumnRenamed("id", "rep"), Seq("rep"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("rep")).as("family"))
    val u = conv(substring(
        md5(concat(lit("7:famsplit:"), col("family").cast("string"))
          .cast("binary")), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0)
    rooted.select(col("doc_id"), col("family"),
      when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
        .as("split"))
  }

  private def qSplitLeakageSafe(implicit s: SparkSession, dir: String): DataFrame = {
    // cache barrier: the assignment feeds both the per-split aggregate
    // and the straddle check; uncached, the full family-resolution
    // chain (exact families → LSH → connected components → joins)
    // would evaluate twice per action
    val assigned = graft.core.Caches.track(leakageSafeAssignment(s, dir))
    val perSplit = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("family")).as("n_families"))
    val straddle = assigned.select(col("family"), col("split")).distinct()
      .groupBy(col("family")).agg(count(lit(1)).as("n_splits"))
      .where(col("n_splits") > 1)
      .agg(count(lit(1)).as("straddling"))
    perSplit.crossJoin(straddle)
      .select(col("split"), col("n_docs"), col("n_families"),
        col("straddling"))
      .orderBy(col("split"))
  }

  private val qSplitLeakageSafeSql = {
    val h15 = graft.operators.Scorers.ProxyBackend
      .h15Sql(7L, "'famsplit:' || CAST(family AS VARCHAR)")
    s"""WITH RECURSIVE ${minhashPairCtes(
          "reps AS (\n  SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text),\n",
          "reps")},
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach(id, comp) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id),
       |lab AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
       |docfam AS (
       |  SELECT d.doc_id, coalesce(lab.comp, r.doc_id) AS family
       |  FROM documents d JOIN reps r ON r.text = d.text
       |  LEFT JOIN lab ON lab.id = r.doc_id),
       |assigned AS (
       |  SELECT doc_id, family,
       |    CASE WHEN CAST($h15 AS DOUBLE) / 1152921504606846976.0 < 0.8 THEN 'train'
       |         WHEN CAST($h15 AS DOUBLE) / 1152921504606846976.0 < 0.9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM docfam),
       |straddle AS (
       |  SELECT COUNT(*) AS straddling FROM (
       |    SELECT family FROM (SELECT DISTINCT family, split FROM assigned)
       |    GROUP BY family HAVING COUNT(*) > 1))
       |SELECT split, COUNT(*) AS n_docs,
       |  CAST(COUNT(DISTINCT family) AS BIGINT) AS n_families,
       |  (SELECT straddling FROM straddle) AS straddling
       |FROM assigned GROUP BY split ORDER BY split""".stripMargin
  }

  // --------------------------------------- incremental curation (CDC)
  /** INCREMENTAL curation — the daily-ingest shape of the flagship
    * pipeline: corpus v0 (doc_id % 10 ≠ 0) is curated ONCE and its
    * per-family state persisted (exact families, banded signatures,
    * shingle sets, near-dup pairs, scored reps); the day's delta
    * (% 10 = 0) then flows through a DELTA-SIZED update whose output
    * is gated EQUAL to re-curating the full corpus from scratch —
    * the same oracle chain as [[qCurateSink]], unrestricted.
    *
    * Why the update is exact, stage by stage (each identity is what
    * the from-scratch oracle checks):
    *  - exact reps: v1's min-id rep per text = least(v0 rep, delta
    *    min) per family — a keyed merge of the persisted family
    *    table with the delta's per-family minima; families whose rep
    *    id CHANGES (a smaller delta id arrived) relabel downstream
    *    state, they never recompute it (signatures, jaccards, and
    *    quality are functions of the TEXT, which didn't change);
    *  - near-dup pairs: v1's pair set = relabeled v0 pairs ∪
    *    delta-family probe pairs ([[Dedup.incrementalNearDupPairs]]:
    *    new×store + new×new) — banding and verify depend only on
    *    text, so old×old pairs are exactly the relabeled v0 set;
    *  - clusters: connected components re-run over the merged EDGE
    *    list — edge-set-sized (pairs are a vanishing fraction of the
    *    corpus), never corpus-sized;
    *  - band: per-language quantile thresholds must see all keepers,
    *    so the one corpus-shaped touch is a single scan of the
    *    persisted SCORED table (3 metadata columns) — the full DAG
    *    (shingling, signing, banding, verification) stays
    *    delta-sized. At 100 TB that's the difference between a daily
    *    multi-hour re-curate and minutes of delta work plus one
    *    columnar scan. */
  /** The persisted v0 curate state behind [[qCurateIncremental]] and
    * [[qStreamCurate]] — built once per sf dir per JVM. */
  private def curateV0StatePath(implicit s: SparkSession, dir: String): String = {
    import graft.core.Scratch
    Scratch.buildOnce("curate_v0_state", dir) { p =>
      val v0 = docs.select(col("doc_id"), col("text"), col("lang"))
        .where(col("doc_id") % 10 =!= 0)
      val fam = graft.core.Caches.track(
        v0.groupBy(md5(col("text")).as("digest"))
          .agg(min(col("doc_id")).as("rep"),
            min_by(col("lang"), col("doc_id")).as("lang"),
            min_by(col("text"), col("doc_id")).as("text")))
      val reps = fam.select(col("rep").as("doc_id"), col("text"), col("lang"))
      fam.select(col("digest"), col("rep")).write.parquet(s"$p/fam")
      Dedup.bandedSignatures(reps, "doc_id", "text", n = 3, k = MhK,
        bands = MhBands).write.parquet(s"$p/banded")
      Dedup.shingleSets(reps, "doc_id", "text", n = 3)
        .write.parquet(s"$p/sets")
      Dedup.nearDupPairs(reps.select(col("doc_id"), col("text")),
          "doc_id", "text", n = 3, k = MhK, bands = MhBands, threshold = 0.5)
        .select(col("id_a"), col("id_b")).write.parquet(s"$p/pairs")
      reps.select(col("doc_id"), col("lang"),
          TextFns.qualityScore(col("text")).as("quality"))
        .write.parquet(s"$p/scored")
      graft.core.Caches.releaseAll()
    }
  }

  private def qCurateIncremental(implicit s: SparkSession, dir: String): DataFrame = {
    val state = curateV0StatePath
    val delta = docs.select(col("doc_id"), col("text"), col("lang"))
      .where(col("doc_id") % 10 === 0)
    val dfam = graft.core.Caches.track(
      delta.groupBy(md5(col("text")).as("digest"))
        .agg(min(col("doc_id")).as("dmin"),
          min_by(col("lang"), col("doc_id")).as("dlang"),
          min_by(col("text"), col("doc_id")).as("dtext")))
    val j = s.read.parquet(s"$state/fam")
      .join(dfam, Seq("digest"), "full_outer")
    // rep id changes (smaller delta id joined an existing family) —
    // broadcast-sized by construction: bounded by the delta
    val changed = graft.core.Caches.track(j
      .where(col("rep").isNotNull && col("dmin") < col("rep"))
      .select(col("rep").as("_old"), col("dmin").as("_new"),
        col("dlang").as("_nlang")))
    val newFams = graft.core.Caches.track(j.where(col("rep").isNull)
      .select(col("dmin").as("doc_id"), col("dtext").as("text"),
        col("dlang").as("lang")))

    def relabel(df: DataFrame, c: String): DataFrame =
      df.join(broadcast(changed.select(col("_old").as(c), col("_new"))),
          Seq(c), "left")
        .withColumn(c, coalesce(col("_new"), col(c))).drop("_new")

    val pairs0r = relabel(relabel(s.read.parquet(s"$state/pairs"),
        "id_a"), "id_b")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    val newBanded = Dedup.bandedSignatures(newFams, "doc_id", "text",
      n = 3, k = MhK, bands = MhBands)
    val allSets = s.read.parquet(s"$state/sets")
      .unionByName(Dedup.shingleSets(newFams, "doc_id", "text", n = 3))
    val incPairs = relabel(relabel(
        Dedup.incrementalNearDupPairs(newBanded,
            s.read.parquet(s"$state/banded"), allSets, "doc_id",
            threshold = 0.5)
          .select(col("id_a"), col("id_b")), "id_a"), "id_b")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    // disjoint by construction: v0 pairs are old×old, probe pairs
    // touch ≥1 new family
    val pairsAll = pairs0r.unionByName(incPairs)

    val scored0r = s.read.parquet(s"$state/scored")
      .join(broadcast(changed.select(col("_old").as("doc_id"),
        col("_new"), col("_nlang"))), Seq("doc_id"), "left")
      .select(coalesce(col("_new"), col("doc_id")).as("doc_id"),
        coalesce(col("_nlang"), col("lang")).as("lang"), col("quality"))
    val scoredNew = newFams.select(col("doc_id"), col("lang"),
      TextFns.qualityScore(col("text")).as("quality"))
    val comps = Dedup.connectedComponents(pairsAll, "id_a", "id_b")
    val dropIds = comps.where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val curated = scored0r.unionByName(scoredNew)
      .join(dropIds, Seq("doc_id"), "left_anti")
    Selection.percentileBand(curated, "lang", "quality",
        0.25, 0.75, minGroupSize = 20)
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  private val qCurateIncrementalSql =
    s"""WITH RECURSIVE $curateBandCtes
       |SELECT doc_id, lang, quality FROM band
       |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- streaming curation (CDC)
  /** [[qCurateIncremental]]'s delta update as an ACTUAL STREAM — the
    * CDC loop deployed through
    * [[graft.streaming.EventStreams.streamingCurateFeed]]: the day's
    * delta arrives in `parts` micro-batches; each batch emits
    * digest-keyed family candidates and its verified new×store pairs
    * against the persisted v0 state; the post-stream assembly then
    * min-merges the candidates per digest (invariant to chopping),
    * adds the delta-internal new×new pairs (batch-sized, computed
    * once — per-batch emission would miss pairs straddling batch
    * boundaries), and runs the same relabel → CC → per-language
    * quantile band as the batch path. Gated EQUAL to re-curating the
    * full corpus from scratch (the identical oracle as
    * `q_curate_incremental`); StreamingSpec asserts the
    * batch-boundary invariance directly (parts = 1 ≡ parts = 3). */
  private[graft] def streamCurateResult(s: SparkSession, sfDir: String,
                                        parts: Int): DataFrame = {
    implicit val sp: SparkSession = s
    implicit val dir: String = sfDir
    val state = curateV0StatePath
    val (famCands, streamPairs) = graft.streaming.EventStreams
      .streamingCurateFeed(s, sfDir, state, n = 3, k = MhK, bands = MhBands,
        threshold = 0.5, parts = parts)
    // min-merge the per-batch family candidates: global min doc id
    // per digest; lang/text ride along from the batch holding it
    val dfam = graft.core.Caches.track(famCands
      .groupBy(col("digest"))
      .agg(min(col("dmin")).as("dmin"),
        min_by(col("dlang"), col("dmin")).as("dlang"),
        min_by(col("dtext"), col("dmin")).as("dtext")))
    val j = s.read.parquet(s"$state/fam")
      .join(dfam, Seq("digest"), "full_outer")
    val changed = graft.core.Caches.track(j
      .where(col("rep").isNotNull && col("dmin") < col("rep"))
      .select(col("rep").as("_old"), col("dmin").as("_new"),
        col("dlang").as("_nlang")))
    val newFams = graft.core.Caches.track(j.where(col("rep").isNull)
      .select(col("dmin").as("doc_id"), col("dtext").as("text"),
        col("dlang").as("lang")))

    def relabel(df: DataFrame, c: String): DataFrame =
      df.join(broadcast(changed.select(col("_old").as(c), col("_new"))),
          Seq(c), "left")
        .withColumn(c, coalesce(col("_new"), col(c))).drop("_new")

    val pairs0r = relabel(relabel(s.read.parquet(s"$state/pairs"),
        "id_a"), "id_b")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    // stream-emitted new×store pairs: digest → final new-family rep,
    // store side relabeled (a smaller delta id may have taken over
    // the store family's rep)
    val streamMapped = relabel(streamPairs.distinct()
        .join(dfam.select(col("digest"), col("dmin")), Seq("digest"))
        .select(col("dmin").as("id_a"), col("store_id").as("id_b")),
        "id_b")
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    // delta-internal pairs, computed ONCE post-stream
    val newnew = Dedup.nearDupPairs(
        newFams.select(col("doc_id"), col("text")), "doc_id", "text",
        n = 3, k = MhK, bands = MhBands, threshold = 0.5)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    // disjoint by construction: old×old, new×store, new×new
    val pairsAll = pairs0r.unionByName(streamMapped).unionByName(newnew)

    val scored0r = s.read.parquet(s"$state/scored")
      .join(broadcast(changed.select(col("_old").as("doc_id"),
        col("_new"), col("_nlang"))), Seq("doc_id"), "left")
      .select(coalesce(col("_new"), col("doc_id")).as("doc_id"),
        coalesce(col("_nlang"), col("lang")).as("lang"), col("quality"))
    val scoredNew = newFams.select(col("doc_id"), col("lang"),
      TextFns.qualityScore(col("text")).as("quality"))
    val comps = Dedup.connectedComponents(pairsAll, "id_a", "id_b")
    val dropIds = comps.where(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val curated = scored0r.unionByName(scoredNew)
      .join(dropIds, Seq("doc_id"), "left_anti")
    Selection.percentileBand(curated, "lang", "quality",
        0.25, 0.75, minGroupSize = 20)
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  private def qStreamCurate(implicit s: SparkSession, dir: String): DataFrame =
    streamCurateResult(s, dir, parts = 4)

  // --------------------------------------- curate once, derive twice
  /** Times the curation DAG actually EXECUTED for the artifact path —
    * spec-visible so CurateArtifactSpec can assert "ran once" across
    * repeated derivations (the reference's own stage-checkpoint-reuse
    * semantics, reference `main.py:312-314`). */
  private[graft] val curatedArtifactRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Persist [[curatedBand]] ONCE per sf dir per JVM as a parquet
    * checkpoint artifact and return its path. Every downstream
    * consumer — the stride sample, the partitioned sink — reads the
    * artifact instead of re-running dedup → CC → band, so the
    * expensive DAG is paid once per corpus version no matter how many
    * derivations follow (at 100 TB the artifact IS the product; the
    * DAG re-run per consumer would be the bill). */
  private def curatedArtifact(implicit s: SparkSession, dir: String): String =
    graft.core.Scratch.buildOnce("curated_band", dir) { p =>
      curatedArtifactRuns.incrementAndGet()
      curatedBand.select(col("doc_id"), col("lang"), col("quality"))
        .write.mode("overwrite").parquet(p)
    }

  /** The stride sample derived FROM THE ARTIFACT — same result as
    * [[qCuratePipeline]] (same oracle SQL), but its plan is a parquet
    * scan of the checkpoint plus the sample window: the curation DAG
    * does not appear, because it already ran. */
  private def qCurateFromArtifact(implicit s: SparkSession, dir: String): DataFrame =
    Selection.strideSample(s.read.parquet(curatedArtifact), "lang", "doc_id", 5)
      .select(col("lang"), col("doc_id"), col("quality"))
      .orderBy(col("lang"), col("doc_id"))

  /** Training-shard EXPORT MANIFEST — the accounting artifact a
    * dataset release publishes next to its shards: the curated band
    * (read from the checkpoint, not recomputed) is cut into
    * ~[[ExportShardTokens]]-token shards per language by cumulative
    * token offset, and the manifest reports docs + tokens per shard.
    * Composition of proven pieces: the curate-once artifact, the
    * `q_pack_sequences` prefix-sum idiom (per-language partitioned
    * window; the bucket-decomposed form takes over at 100 TB, as in
    * token-budget selection), and token counting. A consumer resumes
    * a partial download from the manifest — and an off-by-one shard
    * boundary fails the hash. */
  private val ExportShardTokens = 2000L
  private def qExportManifest(implicit s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val band = s.read.parquet(curatedArtifact).select(col("doc_id"), col("lang"))
    val toks = docs.select(col("doc_id"),
      TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    band.join(toks, "doc_id")
      .withColumn("start_tok", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("shard", expr(s"start_tok div $ExportShardTokens"))
      .groupBy(col("lang"), col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("lang"), col("shard"))
  }

  private val qExportManifestSql =
    s"""WITH RECURSIVE $curateBandCtes,
       |band_toks AS (
       |  SELECT b.lang, b.doc_id,
       |    CAST(len(string_split_regex(trim(d.text), '\\s+')) AS BIGINT) AS n_toks
       |  FROM band b JOIN documents d ON d.doc_id = b.doc_id),
       |cum AS (
       |  SELECT lang, doc_id, n_toks,
       |    CAST(coalesce(SUM(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_tok
       |  FROM band_toks)
       |SELECT lang, CAST(start_tok // $ExportShardTokens AS BIGINT) AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The partitioned training sink derived FROM THE ARTIFACT — same
    * result and oracle as [[qCurateSink]], but the band is read from
    * the checkpoint: together with [[qCurateFromArtifact]] this is
    * "curate once, derive twice", and the spec asserts the DAG
    * executed exactly once for both derivations combined. */
  private def qCurateSinkArtifact(implicit s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.pathFor("curated_from_artifact", dir)
    s.read.parquet(curatedArtifact)
      .select(col("doc_id"), col("quality"), col("lang"))
      // salted like [[qCurateSink]] — see the skew note there
      .repartition(col("lang"),
        pmod(xxhash64(col("doc_id")), lit(SinkSaltBuckets)))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    s.read.parquet(out)
      .where(col("lang") === "en")
      .select(col("doc_id"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** Sort-on-write zone-map skipping — the storage-layout operator for
    * range predicates on a CONTINUOUS column (quality), complementing
    * [[qCurateSink]]'s directory partitioning on a low-cardinality one
    * (lang): score → [[graft.io.SortedLake.writeSorted]] (range
    * partition + in-file sort, 1 MiB row groups) → read back with a
    * `quality >= 0.84` scan whose pushed filter now SKIPS files and
    * row groups via parquet min/max stats (SortedSkipSpec measures the
    * scan reading a fraction of the lake vs ~all of it on an unsorted
    * copy). Gated oracle-exact as a sink→scan→aggregate round trip
    * recomputed from the original table. */
  private def qSortedSkip(implicit s: SparkSession, dir: String): DataFrame = {
    // sort-clustered layout built ONCE per JVM (ingest); the query is
    // the stats-skipping READ the layout exists for.
    val out = graft.core.Scratch.buildOnce("sorted_lake", dir) { p =>
      val scored = docs.select(col("doc_id"), col("lang"),
        TextFns.qualityScore(col("text")).as("quality"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.io.SortedLake.writeSorted(scored, "quality", p, partitions = 8)
    }
    s.read.parquet(out)
      .where(col("quality") >= 0.84)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        round(min(col("quality")), 6).as("min_q"))
      .orderBy(col("lang"))
  }

  private val qSortedSkipSql = {
    val (_, _, quality) = qualitySqlBits
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $quality AS quality,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       |  round(MIN(quality), 6) AS min_q
       |FROM scored WHERE quality >= 0.84
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Z-order variant of [[qSortedSkip]]: the lake clustered on the
    * Morton interleave of (quality, n_tokens) rank buckets, so range
    * scans on EITHER column skip row groups (SortedSkipSpec measures
    * both axes, plus the contrast that a single-column sort leaves the
    * other axis at a full scan). Gated oracle-exact as the same
    * sink→scan→aggregate round trip with a two-sided predicate. */
  private def qZorderSkip(implicit s: SparkSession, dir: String): DataFrame = {
    val out = graft.core.Scratch.buildOnce("zorder_lake", dir) { p =>
      val scored = docs.select(col("doc_id"), col("lang"),
        TextFns.qualityScore(col("text")).as("quality"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.io.SortedLake.writeZOrdered(scored, "quality", "n_tokens", p,
        partitions = 8)
    }
    s.read.parquet(out)
      .where(col("quality") >= 0.6 && col("n_tokens").between(30, 70))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tot_tokens"),
        round(max(col("quality")), 6).as("max_q"))
      .orderBy(col("lang"))
  }

  private val qZorderSkipSql = {
    val (_, _, quality) = qualitySqlBits
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $quality AS quality,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       |  round(MAX(quality), 6) AS max_q
       |FROM scored WHERE quality >= 0.6 AND n_tokens BETWEEN 30 AND 70
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Token-budget corpus selection ("the best 8,000 tokens"): greedy
    * by (quality DESC, doc_id) while the running token total fits the
    * budget — the pre-training-job selection, gated exactly. Spark
    * runs [[Selection.tokenBudgetSelect]]'s bucket-decomposed plan (no
    * global sort — a ≤1001-row histogram window plus per-bucket
    * refinement windows); the oracle replays the SAME semantics as one
    * plain global window, which is the equivalence the decomposition
    * guarantees. Absolute budget: selects ~half the corpus at sf0.01
    * and a sharpening top slice as the corpus grows — output size
    * SHRINKS with sf, the operator's cost does not. */
  private def qTokenBudget(implicit s: SparkSession, dir: String): DataFrame = {
    val scored = docs.select(col("doc_id"),
      TextFns.qualityScore(col("text")).as("quality"),
      TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Selection
      .tokenBudgetSelect(scored, "doc_id", "quality", "n_tokens", budget = 8000L)
      .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  private val qTokenBudgetSql = {
    val (_, _, quality) = qualitySqlBits
    s"""WITH scored AS (
       |  SELECT doc_id, $quality AS quality,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |sel AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM scored)
       |SELECT doc_id, n_tokens, cum_tokens FROM sel
       |WHERE cum_tokens <= 8000 ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------- web-pipeline curation v2
  /** The FineWeb/RefinedWeb-style WEB pipeline as one DAG — the
    * modern-ordering sibling of `q_curate_pipeline`, composing five
    * proven stages: (1) EXACT dedup (text families, min-id reps);
    * (2) ExactSubstr boilerplate strip over the deduped reps
    * ([[graft.operators.Dedup.stripDupSpans]] — after dedup, window
    * occurrence counts mean "distinct documents sharing this span",
    * which is the pipeline-meaningful census AND makes every stage
    * replication-invariant: the whole chain runs over family reps, so
    * the sf ladder must return the IDENTICAL selection at every
    * rung); (3) quality filter on the CLEANED text (≥ 0.5, docs with
    * < 3 surviving tokens drop); (4) per-domain cap (top
    * [[WebCapN]]/source by quality — plain ranking window, which
    * Spark's WindowGroupLimit two-phases map-side, see
    * `q_domain_cap`); (5) global token budget ([[graft.operators.Selection
    * .tokenBudgetSelect]], greedy by quality). Output: the selected
    * doc set with clean token counts and running budget — bounded by
    * the budget at every SF.
    *
    * 100 TB posture: stage 1 is the one corpus-sized shuffle;
    * everything after operates on distinct-text reps (bounded by
    * content diversity, not corpus size); the cap and budget stages
    * are output-bounded. */
  private val WebCapN = 40
  private val WebMinKept = 3
  private val WebQualityMin = 0.5
  private val WebTokenBudget = 8000L

  private def qCurateWeb(implicit s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Selection}
    val fam = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    val reps = graft.core.Caches.track(
      fam.join(docs.select(col("doc_id"), col("source")), Seq("doc_id")))
    val stripped = Dedup.stripDupSpans(
      reps.select(col("doc_id"), col("text")), "doc_id", "text",
      win = 5, seed = 3011L)
    val cleaned = stripped.where(col("n_kept") >= WebMinKept)
      .join(reps.select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("quality", TextFns.qualityScore(col("clean_text")))
      .where(col("quality") >= WebQualityMin)
      .select(col("doc_id"), col("source"), col("n_kept"), col("quality"))
    val wCap = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    val capped = cleaned
      .withColumn("rn", row_number().over(wCap))
      .where(col("rn") <= WebCapN)
      .drop("rn")
    Selection.tokenBudgetSelect(capped, "doc_id", "quality", "n_kept",
        budget = WebTokenBudget)
      .select(col("doc_id"), col("source"), col("n_kept").as("n_tokens"),
        col("quality"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  private val qCurateWebSql = {
    val w = 5
    val wid = graft.operators.Dedup.widSql60(
      s"array_to_string(list_slice(t, CAST(i AS BIGINT), CAST(i + ${w - 1} AS BIGINT)), ' ')",
      3011L)
    val (_, _, quality) = qualitySqlBits
    s"""WITH fam AS (
       |  SELECT text, MIN(doc_id) AS doc_id FROM documents GROUP BY text),
       |reps AS (
       |  SELECT f.doc_id, d.source, f.text
       |  FROM fam f JOIN documents d ON d.doc_id = f.doc_id),
       |base AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM reps),
       |wins AS (
       |  SELECT doc_id, i AS s, $wid AS wid
       |  FROM (SELECT doc_id, t,
       |          unnest(generate_series(1, CAST(len(t) - ${w - 1} AS BIGINT))) AS i
       |        FROM base WHERE len(t) >= $w)),
       |census AS (SELECT wid, COUNT(*) AS occ FROM wins GROUP BY 1),
       |dup AS (SELECT wi.doc_id, wi.s FROM wins wi
       |        JOIN census c USING (wid) WHERE c.occ > 1),
       |isl AS (
       |  SELECT doc_id, s,
       |    CASE WHEN s > coalesce(MAX(s + ${w - 1}) OVER (PARTITION BY doc_id
       |      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS new_isl
       |  FROM dup),
       |isl2 AS (SELECT doc_id, s,
       |    SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM isl),
       |islands AS (SELECT doc_id, isl, MIN(s) AS s0, MAX(s) + ${w - 1} AS e0
       |            FROM isl2 GROUP BY 1, 2),
       |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(s0, e0)) AS p
       |            FROM islands),
       |pos AS (SELECT doc_id, i AS p, t[i] AS tok
       |        FROM (SELECT doc_id, t,
       |                unnest(generate_series(1, CAST(len(t) AS BIGINT))) AS i
       |              FROM base)),
       |kept AS (SELECT po.doc_id, po.p, po.tok FROM pos po
       |         LEFT JOIN covered c ON c.doc_id = po.doc_id AND c.p = po.p
       |         WHERE c.p IS NULL),
       |clean AS (
       |  SELECT b.doc_id, CAST(coalesce(COUNT(k.p), 0) AS BIGINT) AS n_kept,
       |    coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS text
       |  FROM base b LEFT JOIN kept k USING (doc_id)
       |  GROUP BY b.doc_id),
       |clean2 AS (SELECT doc_id, n_kept, text FROM clean),
       |scored AS (
       |  SELECT c.doc_id, r.source, c.n_kept, $quality AS quality
       |  FROM clean2 c JOIN (SELECT doc_id, source FROM reps) r USING (doc_id)
       |  WHERE c.n_kept >= $WebMinKept),
       |qual AS (SELECT * FROM scored WHERE quality >= $WebQualityMin),
       |capped AS (
       |  SELECT doc_id, source, n_kept, quality FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id) AS rn FROM qual)
       |  WHERE rn <= $WebCapN),
       |sel AS (
       |  SELECT doc_id, source, n_kept, quality,
       |    CAST(SUM(n_kept) OVER (ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM capped)
       |SELECT doc_id, source, CAST(n_kept AS BIGINT) AS n_tokens, quality, cum_tokens
       |FROM sel WHERE cum_tokens <= $WebTokenBudget
       |ORDER BY doc_id""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q_curate_web", (s, d) => qCurateWeb(s, d), Some(qCurateWebSql)),
    Q("q_token_budget", (s, d) => qTokenBudget(s, d), Some(qTokenBudgetSql)),
    Q("q_dedup_exact", (s, d) => qDedupExact(s, d), Some(qDedupExactSql)),
    Q("q_curate_pipeline", (s, d) => qCuratePipeline(s, d), Some(qCuratePipelineSql)),
    Q("q_curate_sink", (s, d) => qCurateSink(s, d), Some(qCurateSinkSql)),
    Q("q_curate_funnel", (s, d) => qCurateFunnel(s, d), Some(qCurateFunnelSql)),
    Q("q_curate_from_artifact", (s, d) => qCurateFromArtifact(s, d), Some(qCuratePipelineSql)),
    Q("q_curate_sink_artifact", (s, d) => qCurateSinkArtifact(s, d), Some(qCurateSinkSql)),
    Q("q_curate_incremental", (s, d) => qCurateIncremental(s, d), Some(qCurateIncrementalSql)),
    Q("q_stream_curate", (s, d) => qStreamCurate(s, d), Some(qCurateIncrementalSql)),
    Q("q_split_leakage_safe", (s, d) => qSplitLeakageSafe(s, d), Some(qSplitLeakageSafeSql)),
    Q("q_export_manifest", (s, d) => qExportManifest(s, d), Some(qExportManifestSql)),
    Q("q_dedup_minhash_lsh", (s, d) => qDedupMinhashLsh(s, d), Some(qDedupMinhashLshSql)),
    Q("q_dedup_minhash_lsh_native", (s, d) => qDedupMinhashLshNative(s, d), Some(qDedupMinhashLshSql)),
    Q("q_dedup_ngram_jaccard", (s, d) => qDedupNgramJaccard(s, d), Some(qDedupNgramJaccardSql)),
    Q("q_dedup_simhash", (s, d) => qDedupSimhash(s, d), Some(qDedupSimhashSql)),
    Q("q_dedup_simhash_scalable", (s, d) => qDedupSimhashScalable(s, d), Some(qDedupSimhashScalableSql)),
    Q("q_dedup_ngram_scalable", (s, d) => qDedupNgramScalable(s, d), Some(qDedupNgramScalableSql)),
    Q("q_dedup_minhash_scalable", (s, d) => qDedupMinhashScalable(s, d), Some(qDedupMinhashScalableSql)),
    Q("q_dedup_clusters", (s, d) => qDedupClusters(s, d), Some(qDedupClustersSql)),
    Q("q_dedup_incremental", (s, d) => qDedupIncremental(s, d), Some(qDedupIncrementalSql)),
    Q("q_dedup_incremental_store", (s, d) => qDedupIncrementalStore(s, d), Some(qDedupIncrementalSql)),
    Q("q_dedup_store_day2", (s, d) => qDedupStoreDay2(s, d), Some(qDedupIncrementalSql)),
    Q("q_dedup_group_resolve", (s, d) => qDedupGroupResolve(s, d), Some(qDedupGroupResolveSql)),
    Q("q_stream_dedup_store", (s, d) => qStreamDedupStore(s, d), Some(qStreamDedupStoreSql)),
    Q("q_embed_cosine_topk", (s, d) => qCosineTopK(s, d), Some(qCosineTopKSql)),
    Q("q_embed_ann_lsh", (s, d) => qAnnLsh(s, d), Some(qAnnLshSql)),
    Q("q_embed_ivf", (s, d) => qIvfTopK(s, d), Some(qIvfTopKSql)),
    Q("q_embed_pq_topk", (s, d) => qPqTopK(s, d), Some(qPqTopKSql)),
    Q("q_embed_sq_topk", (s, d) => qEmbedSq(s, d), Some(qEmbedSqSql)),
    Q("q_embed_ivf_store", (s, d) => qIvfStore(s, d), Some(qIvfTopKSql)),
    Q("q_embed_ivf_day2", (s, d) => qIvfStoreDay2(s, d), Some(qIvfTopKSql)),
    Q("q_stream_ann_ingest", (s, d) => qStreamAnnIngest(s, d), Some(qIvfTopKSql)),
    Q("q_embed_ivfpq", (s, d) => qIvfPq(s, d), Some(qIvfPqSql)),
    Q("q_embed_ivfpq_store", (s, d) => qIvfPqStore(s, d), Some(qIvfPqSql)),
    Q("q_embed_ivfpq_day2", (s, d) => qIvfPqStoreDay2(s, d), Some(qIvfPqDay2Sql)),
    Q("q_kcenter_select", (s, d) => qKCenter(s, d), Some(qKCenterSql)),
    Q("q_mmr_select", (s, d) => qMmrSelect(s, d), Some(qMmrSelectSql)),
    Q("q_mmr_select_scalable", (s, d) => qMmrSelectScalable(s, d), Some(qMmrSelectScalableSql)),
    Q("q_hard_negatives", (s, d) => qHardNegatives(s, d), Some(qHardNegativesSql)),
    Q("q_lang_id", (s, d) => qLangId(s, d), Some(qLangIdSql)),
    Q("q_quality_score", (s, d) => qQualityScore(s, d), Some(qQualityScoreSql)),
    Q("q_token_counts", (s, d) => qTokenCounts(s, d), Some(qTokenCountsSql)),
    Q("q_fingerprint", (s, d) => qFingerprint(s, d), Some(qFingerprintSql)),
    Q("q_wordcount_topk", (s, d) => qWordcountTopk(s, d), Some(qWordcountTopkSql)),
    Q("q_index_inverted", (s, d) => qIndexInverted(s, d), Some(qIndexInvertedSql)),
    Q("q_bm25_topk", (s, d) => qBm25TopK(s, d), Some(qBm25TopKSql)),
    Q("q_hybrid_rrf", (s, d) => qHybridRrf(s, d), Some(qHybridRrfSql)),
    Q("q_ngram_novelty", (s, d) => qNgramNovelty(s, d), Some(qNgramNoveltySql)),
    Q("q_textrank", (s, d) => qTextRank(s, d), Some(qTextRankSql)),
    Q("q_sketch_cms", (s, d) => qSketchCms(s, d), Some(qSketchCmsSql)),
    Q("q_heavy_hitters", (s, d) => qHeavyHitters(s, d), Some(qHeavyHittersSql)),
    Q("q_sorted_skip", (s, d) => qSortedSkip(s, d), Some(qSortedSkipSql)),
    Q("q_zorder_skip", (s, d) => qZorderSkip(s, d), Some(qZorderSkipSql)),
    Q("q_wordcount_gen", (s, d) => qWordcountGen(s, d), Some(qWordcountTopkSql)),
    Q("q_bigram_lm_score", (s, d) => qBigramLmScore(s, d), Some(qBigramLmScoreSql)),
    Q("q_sql_functions", (s, d) => qSqlFunctions(s, d), Some(qSqlFunctionsSql)),
    Q("q_sql_params", (s, d) => qSqlParams(s, d), Some(qSqlParamsSql)))
}

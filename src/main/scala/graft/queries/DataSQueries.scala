package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.TextFns
import graft.operators.{Scorers, Selection, TaskVectors}

/** Reference-parity operators (SURVEY.md §2a) as registered queries:
  * the scoring→band-filter→stride-sample selection pipeline, prompt
  * templating, IFD ratio semantics, sampling strategies, and the
  * TaskVector/TIES relational algebra. SQL-expressible ones carry an
  * exact DuckDB oracle; the model-backed (mapPartitions) ones are
  * rows-only.
  */
object DataSQueries extends QueryModule {

  private def docs(implicit s: SparkSession, dir: String) = Tables.documents(s, dir)
  private def li(implicit s: SparkSession, dir: String)   = Tables.lineitem(s, dir)

  // ---------------------------------------------------------- P3 length
  /** Length scorer — the reference's `lenth = len(output)` column
    * (sic, `score_pipeline_lenth.py:35–38`), a pure projection. */
  private def qLenScore(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"), length(col("text")).cast("long").as("lenth"))
      .orderBy(col("doc_id"))

  private val qLenScoreSql =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS lenth
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- P1 prompt template
  /** Alpaca prompt templating (`main.py:177–212`): branch on an empty
    * input between the two templates. The synthetic corpus stands in:
    * text prefix = instruction, source = input ('' for src0). */
  private def qPromptTemplate(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"),
        TextFns.promptToUse(
          substring(col("text"), 1, 60),
          expr("nullif(source, 'src0')")).as("prompt"))
      .orderBy(col("doc_id"))

  private val qPromptTemplateSql = {
    val t1 = TextFns.TemplateNoInput.replace("%s", "%s")
    val t2 = TextFns.TemplateWithInput
    s"""SELECT doc_id,
       |  CASE WHEN COALESCE(NULLIF(source, 'src0'), '') = ''
       |    THEN printf('${t1.replace("'", "''")}', substr(text, 1, 60))
       |    ELSE printf('${t2.replace("'", "''")}', substr(text, 1, 60), NULLIF(source, 'src0'))
       |  END AS prompt
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------- P7/A3 IFD ratio
  /** IFD stage-2 semantics on oracle-checkable arrays: ratio of two
    * array means (distinct-token lengths vs all-token lengths) with
    * the reference's guards — null on empty span, drop ratio > 1
    * (`score_pipeline_ifd.py:193–211`). */
  private def qIfdRatio(implicit s: SparkSession, dir: String): DataFrame = {
    val toks = TextFns.tokens(col("text"))
    def meanLen(arr: Column) =
      aggregate(transform(arr, t => length(t).cast("long")), lit(0L),
        (a, x) => a + x).cast("double") / size(arr)
    docs.select(col("doc_id"),
        when(size(toks) === 0, lit(null))
          .otherwise(round(meanLen(array_distinct(toks)) / meanLen(toks), 6))
          .as("score_ifd"))
      .where(col("score_ifd").isNull || col("score_ifd") <= 1.0)
      .orderBy(col("doc_id"))
  }

  private val qIfdRatioSql =
    """SELECT doc_id, score_ifd FROM (
      |  SELECT doc_id,
      |    CASE WHEN len(toks) = 0 THEN NULL
      |      ELSE round(
      |        (CAST(list_aggregate(list_transform(list_distinct(toks), t -> length(t)), 'sum') AS DOUBLE)
      |           / len(list_distinct(toks)))
      |        / (CAST(list_aggregate(list_transform(toks, t -> length(t)), 'sum') AS DOUBLE)
      |           / len(toks)), 6)
      |    END AS score_ifd
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents)
      |) WHERE score_ifd IS NULL OR score_ifd <= 1.0
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------- F1/F2/K1 cluster select
  /** The flagship EP1 selection pipeline (`main.py:381–482`) end to
    * end, relationally: per-cluster confidence (embedding L2 norm as
    * the ppl proxy), exact 25–75 percentile band with small-cluster
    * passthrough, stride sampling of ≤5 per cluster in original order.
    * Uses the [[Selection]] library operators. */
  private def qClusterSelect(implicit s: SparkSession, dir: String): DataFrame = {
    // ppl-proxy confidence: position-weighted projection of the
    // embedding (its plain L2 norm is degenerate — vectors are unit-
    // normalized). Native codegen'd fold, identical to
    // `aggregate(transform(e, (x,i) -> x·(i+1)), 0.0, +)` and the
    // oracle's 1-based list_transform.
    val conf = round(graft.plans.PosWeightedSum(col("embedding")), 6)
    val scored = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), conf.as("conf"))
    val band = Selection.percentileBand(scored, "label", "conf",
      0.25, 0.75, minGroupSize = 20)
    Selection.strideSample(band, "label", "vec_id", 5)
      .select(col("label"), col("vec_id"), col("conf"))
      .orderBy(col("label"), col("vec_id"))
  }

  private val qClusterSelectSql =
    """WITH conf AS (
      |  SELECT vec_id, label,
      |    round(list_aggregate(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * i), 'sum'), 6) AS conf
      |  FROM embeddings),
      |th AS (
      |  SELECT label, quantile_cont(conf, 0.25) AS lo, quantile_cont(conf, 0.75) AS hi,
      |         count(*) AS n
      |  FROM conf GROUP BY label),
      |band AS (
      |  SELECT c.vec_id, c.label, c.conf FROM conf c JOIN th ON c.label = th.label
      |  WHERE th.n < 20 OR (c.conf >= th.lo AND c.conf <= th.hi)),
      |rn AS (
      |  SELECT *, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn,
      |         count(*) OVER (PARTITION BY label) AS cnt
      |  FROM band)
      |SELECT label, vec_id, conf FROM (
      |  SELECT *, greatest(cnt // 5, 1) AS step FROM rn)
      |WHERE cnt <= 5 OR ((rn - 1) % step = 0 AND (rn - 1) // step < 5)
      |ORDER BY label, vec_id""".stripMargin

  // ---------------------------------------------------- K2 strategies
  /** LeastConfidence sampling: order by the uncertainty metric, take n
    * (`main.py:57–69` registry; bodies absent upstream). Deterministic
    * tie-break on doc_id. */
  private def qSampleLeastConf(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"), col("n_chars"))
      .orderBy(col("n_chars"), col("doc_id"))
      .limit(50)
      .orderBy(col("doc_id"))

  private val qSampleLeastConfSql =
    """SELECT doc_id, n_chars FROM
      |  (SELECT doc_id, n_chars FROM documents ORDER BY n_chars, doc_id LIMIT 50)
      |ORDER BY doc_id""".stripMargin

  /** RandomSampling, reproducibly: order by md5(id) — a seeded shuffle
    * both engines compute identically (`rand()` is not
    * cross-engine-stable). */
  private def qSampleRandom(implicit s: SparkSession, dir: String): DataFrame =
    docs.select(col("doc_id"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(50)
      .orderBy(col("doc_id"))

  private val qSampleRandomSql =
    """SELECT doc_id FROM
      |  (SELECT doc_id FROM documents ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 50)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- T1 taskvector diff
  /** TaskVector diff (`merging.py:42–50`) over long-format tensors
    * derived from lineitem: model F vs model O, param_key = supplier
    * group, idx = part slot, value = signed quantity mass (integers →
    * exact cross-engine arithmetic). */
  private def modelVec(status: String)(implicit s: SparkSession, dir: String): DataFrame =
    li.where(col("l_linestatus") === status)
      .groupBy(
        concat(lit("p"), col("l_suppkey") % 4).as("param_key"),
        (col("l_partkey") % 64).cast("long").as("idx"))
      .agg(sum(when(col("l_orderkey") % 2 === 0, col("l_quantity"))
        .otherwise(-col("l_quantity"))).cast("long").cast("double").as("value"))

  private def qTaskVectorDiff(implicit s: SparkSession, dir: String): DataFrame =
    TaskVectors.diff(modelVec("F"), modelVec("O"))
      .select(col("param_key"), col("idx"), col("value").as("delta"))
      .orderBy(col("param_key"), col("idx"))

  private val modelVecSql: String => String = status =>
    s"""SELECT 'p' || CAST(l_suppkey % 4 AS VARCHAR) AS param_key,
       |  l_partkey % 64 AS idx,
       |  CAST(CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity ELSE -l_quantity END) AS BIGINT) AS DOUBLE) AS value
       |FROM lineitem WHERE l_linestatus = '$status'
       |GROUP BY 1, 2""".stripMargin

  private val qTaskVectorDiffSql =
    s"""WITH f AS (${modelVecSql("F")}), o AS (${modelVecSql("O")})
       |SELECT f.param_key, f.idx, f.value - o.value AS delta
       |FROM f JOIN o ON f.param_key = o.param_key AND f.idx = o.idx
       |ORDER BY f.param_key, f.idx""".stripMargin

  // ------------------------------------------------- T2–T4 TIES merge
  /** Full TIES pipeline (`merging.py:186–267`): per-model top-20%%
    * magnitude mask, majority-sign resolution, disjoint mean merge —
    * three models keyed by l_returnflag. */
  private def qTiesMerge(implicit s: SparkSession, dir: String): DataFrame = {
    val stacked = li.groupBy(
        col("l_returnflag").as("model"),
        concat(lit("p"), col("l_suppkey") % 4).as("param_key"),
        (col("l_partkey") % 32).cast("long").as("idx"))
      .agg(sum(when(col("l_orderkey") % 2 === 0, col("l_quantity"))
        .otherwise(-col("l_quantity"))).cast("long").cast("double").as("value"))
    TaskVectors.tiesMerge(stacked, keep = 0.2, method = "mean")
      .select(col("param_key"), col("idx"), round(col("value"), 6).as("merged"))
      .orderBy(col("param_key"), col("idx"))
  }

  private val qTiesMergeSql =
    """WITH stacked AS (
      |  SELECT l_returnflag AS model,
      |    'p' || CAST(l_suppkey % 4 AS VARCHAR) AS param_key,
      |    l_partkey % 32 AS idx,
      |    CAST(CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity ELSE -l_quantity END) AS BIGINT) AS DOUBLE) AS value
      |  FROM lineitem GROUP BY 1, 2, 3),
      |th AS (
      |  SELECT model, param_key, quantile_cont(abs(value), 0.8) AS th
      |  FROM stacked GROUP BY model, param_key),
      |masked AS (
      |  SELECT s.model, s.param_key, s.idx,
      |    CASE WHEN abs(s.value) >= th.th THEN s.value ELSE 0.0 END AS value
      |  FROM stacked s JOIN th ON s.model = th.model AND s.param_key = th.param_key),
      |gamma AS (
      |  SELECT param_key, idx, sign(SUM(value)) AS gamma
      |  FROM masked GROUP BY param_key, idx)
      |SELECT m.param_key, m.idx,
      |  round(SUM(CASE WHEN sign(m.value) = g.gamma AND m.value <> 0.0 THEN m.value ELSE 0.0 END)
      |    / greatest(SUM(CASE WHEN sign(m.value) = g.gamma AND m.value <> 0.0 THEN 1 ELSE 0 END), 1), 6) AS merged
      |FROM masked m JOIN gamma g ON m.param_key = g.param_key AND m.idx = g.idx
      |GROUP BY m.param_key, m.idx
      |ORDER BY m.param_key, m.idx""".stripMargin

  // --------------------------------------- sharegpt multi-turn model
  /** The reference's PLANNED multi-turn sharegpt format
    * (`data/rawdata/readme.md:14–27`): conversation =
    * array<struct<human, assistant>>. Built here from the corpus
    * (text halves as one exchange), then flattened with posexplode
    * and aggregated per role — the array-of-struct explode/aggregate
    * path a conversation dataset needs. */
  private def qSharegptTurns(implicit s: SparkSession, dir: String): DataFrame = {
    val half = (length(col("text")) / 2).cast("int")
    val conv = array(
      struct(substring(col("text"), 1, 60).as("human"),
        col("text").substr(half + 1, lit(60)).as("assistant")),
      struct(col("source").as("human"), col("lang").as("assistant")))
    docs.select(col("doc_id"), conv.as("conversation"))
      .select(col("doc_id"),
        posexplode(col("conversation")).as(Seq("turn", "ex")))
      .select(col("doc_id"), col("turn"),
        length(col("ex.human")).as("len_human"),
        length(col("ex.assistant")).as("len_assistant"))
      .groupBy(col("turn"))
      .agg(count(lit(1)).as("n"),
        sum(col("len_human")).cast("long").as("chars_human"),
        sum(col("len_assistant")).cast("long").as("chars_assistant"))
      .orderBy(col("turn"))
  }

  private val qSharegptTurnsSql =
    """WITH conv AS (
      |  SELECT doc_id, [
      |    struct_pack(human := substr(text, 1, 60),
      |      assistant := substr(text, CAST(length(text) // 2 AS INTEGER) + 1, 60)),
      |    struct_pack(human := source, assistant := lang)
      |  ] AS conversation FROM documents),
      |turns AS (
      |  SELECT doc_id,
      |    CAST(generate_subscripts(conversation, 1) - 1 AS INTEGER) AS turn,
      |    unnest(conversation) AS ex
      |  FROM conv)
      |SELECT turn, COUNT(*) AS n,
      |  CAST(SUM(length(ex.human)) AS BIGINT) AS chars_human,
      |  CAST(SUM(length(ex.assistant)) AS BIGINT) AS chars_assistant
      |FROM turns GROUP BY turn ORDER BY turn""".stripMargin

  // --------------------------------------- sharegpt per-turn IFD
  /** Per-turn IFD over the synthesized sharegpt conversations (the
    * multi-turn extension of q_ifd_full): each turn's assistant span
    * scored conditionally on the FULL history + current human message,
    * with the same empty-span/ratio guards. The proxy backend's md5
    * hashing keeps even this conversation-shaped pipeline oracle-exact
    * — DuckDB rebuilds the identical history prompt by list slicing. */
  private def qSharegptIfd(implicit s: SparkSession, dir: String): DataFrame = {
    val half = (length(col("text")) / 2).cast("int")
    val conv = array(
      struct(substring(col("text"), 1, 60).as("human"),
        col("text").substr(half + 1, lit(60)).as("assistant")),
      struct(col("source").as("human"), col("lang").as("assistant")))
    Scorers.sharegptIfdPipeline(
        docs.select(col("doc_id"), conv.as("conversation")),
        "doc_id", "conversation", () => new Scorers.ProxyBackend(42L))
      .select(col("doc_id"), col("turn"),
        round(col("score_ifd"), 6).as("score_ifd"))
      .orderBy(col("doc_id"), col("turn"))
  }

  /** Shared per-turn IFD oracle chain: `convCte` must yield
    * (`idCol`, conversation). Everything downstream — history-prompt
    * construction, proxy losses, P6/P7 guards — is ONE definition, so
    * the synthesized-column and file-ingestion twins can never
    * silently diverge in guard math. Mirrors
    * [[Scorers.sharegptIfdPipeline]] clause for clause. */
  private def sharegptIfdOracle(idCol: String, convCte: String): String = {
    import Scorers.ProxyBackend.unitSql
    def losses(prompt: String) =
      s"""list_transform(toks, (t, i) ->
         |      0.05 + 4.0 * ${unitSql(42L, s"'tl:' || $prompt || '#' || t || '#' || (i - 1)")})""".stripMargin
    s"""WITH conv AS ($convCte),
       |turns AS (
       |  SELECT $idCol, conversation,
       |    CAST(generate_subscripts(conversation, 1) - 1 AS INTEGER) AS turn,
       |    unnest(conversation) AS ex
       |  FROM conv),
       |pr AS (
       |  SELECT $idCol, turn,
       |    CASE WHEN turn = 0 THEN ex.human
       |      ELSE array_to_string(list_transform(conversation[1:turn],
       |             x -> x.human || ' ' || x.assistant), ' ') || ' ' || ex.human
       |    END AS prompt,
       |    list_filter(string_split_regex(trim(coalesce(ex.assistant, '')), '\\s+'),
       |      t -> t <> '') AS toks
       |  FROM turns),
       |sc AS (
       |  SELECT $idCol, turn,
       |    ${losses("''")} AS la,
       |    ${losses("coalesce(prompt, '')")} AS lc
       |  FROM pr
       |  WHERE coalesce(len(string_split_regex(trim(prompt), '\\s+')), -1) < 1024),
       |r AS (
       |  SELECT $idCol, turn,
       |    CASE WHEN len(la) = 0 OR len(lc) = 0 THEN NULL
       |      ELSE (list_aggregate(lc, 'sum') / len(lc))
       |         / (list_aggregate(la, 'sum') / len(la)) END AS score
       |  FROM sc)
       |SELECT $idCol, turn, round(score, 6) AS score_ifd FROM r
       |WHERE score IS NULL OR score <= 1.0
       |ORDER BY $idCol, turn""".stripMargin
  }

  private val qSharegptIfdSql = sharegptIfdOracle("doc_id",
    """
       |  SELECT doc_id, [
       |    struct_pack(human := substr(text, 1, 60),
       |      assistant := substr(text, CAST(length(text) // 2 AS INTEGER) + 1, 60)),
       |    struct_pack(human := source, assistant := lang)
       |  ] AS conversation FROM documents""".stripMargin)

  /** VARIABLE-length multi-turn IFD — the at-scale shape of the
    * ShareGPT surface: conversations synthesized from documents with
    * 1 + doc_id % 4 turns (each turn chops its own 40-char segment of
    * the text into a 20-char human / 20-char assistant pair), so turn
    * counts, history lengths, and empty-tail spans all vary across
    * the corpus — history prompts GROW with the turn index, which is
    * the cost profile a real multi-turn corpus has and the 2-turn
    * synthesis (`q_sharegpt_ifd`) cannot exercise. Same pipeline, same
    * guard math, same per-turn oracle chain via a different convCte. */
  private def qSharegptMultiturn(implicit s: SparkSession, dir: String): DataFrame = {
    val nTurns = (col("doc_id") % 4 + 1).cast("int")
    val conv = expr(
      "transform(sequence(0, CAST(doc_id % 4 AS INT)), i -> " +
        "named_struct('human', substring(text, i * 40 + 1, 20), " +
        "'assistant', substring(text, i * 40 + 21, 20)))")
    Scorers.sharegptIfdPipeline(
        docs.select(col("doc_id"), conv.as("conversation")),
        "doc_id", "conversation", () => new Scorers.ProxyBackend(42L))
      .select(col("doc_id"), col("turn"),
        round(col("score_ifd"), 6).as("score_ifd"))
      .orderBy(col("doc_id"), col("turn"))
  }

  private val qSharegptMultiturnSql = sharegptIfdOracle("doc_id",
    """
       |  SELECT doc_id, list_transform(range(doc_id % 4 + 1), i ->
       |    struct_pack(human := substr(text, CAST(i * 40 + 1 AS INTEGER), 20),
       |      assistant := substr(text, CAST(i * 40 + 21 AS INTEGER), 20)))
       |    AS conversation FROM documents""".stripMargin)

  // ------------------------------------ sharegpt FILE ingestion gate
  /** Sharegpt ingestion through the real reader
    * ([[graft.io.JsonIO.readSharegpt]]) over an actual JSONL file —
    * the path a user ingesting conversation files hits (pinned
    * array-of-struct schema, splittable line-delimited scan), unlike
    * q_sharegpt_turns' synthesized column. The oracle reads the same
    * file with DuckDB's read_json. */
  private def qSharegptFile(implicit s: SparkSession, dir: String): DataFrame = {
    val path = graft.io.JsonIO.sharegptFixture()
    graft.io.JsonIO.readSharegpt(s, path)
      .select(col("conversation_id"), col("category"),
        posexplode(col("conversation")).as(Seq("turn", "ex")))
      .groupBy(col("category"))
      .agg(countDistinct(col("conversation_id")).as("n_convs"),
        count(lit(1)).as("n_turns"),
        sum(length(col("ex.human"))).cast("long").as("chars_human"),
        sum(length(col("ex.assistant"))).cast("long").as("chars_assistant"))
      .orderBy(col("category"))
  }

  private val qSharegptFileSql = {
    // eager: the oracle must find the file even if the Spark-side
    // query never ran in this process (registration writes it too).
    // Non-fatal: a failed write here must degrade to ONE failing query
    // (q_sharegpt_file retries in its fn), not an
    // ExceptionInInitializerError that kills every registered query.
    scala.util.Try(graft.io.JsonIO.sharegptFixture())
    s"""WITH t AS (
       |  SELECT conversation_id, category, unnest(conversation) AS ex
       |  FROM read_json('${graft.io.JsonIO.SharegptFixturePath}',
       |    format = 'newline_delimited',
       |    columns = {conversation_id: 'VARCHAR', category: 'VARCHAR',
       |               conversation: 'STRUCT(human VARCHAR, assistant VARCHAR)[]'}))
       |SELECT category,
       |  COUNT(DISTINCT conversation_id) AS n_convs,
       |  COUNT(*) AS n_turns,
       |  CAST(SUM(length(ex.human)) AS BIGINT) AS chars_human,
       |  CAST(SUM(length(ex.assistant)) AS BIGINT) AS chars_assistant
       |FROM t GROUP BY category ORDER BY category""".stripMargin
  }

  // ---------------------------- sharegpt FILE → per-turn IFD, joined up
  /** The two halves composed end-to-end: REAL file ingestion
    * ([[graft.io.JsonIO.readSharegpt]] over the JSONL fixture) feeding
    * the per-turn history-conditioned IFD pipeline — the full path a
    * user scoring conversation files runs, gated oracle-exact. */
  private def qSharegptFileIfd(implicit s: SparkSession, dir: String): DataFrame = {
    val path = graft.io.JsonIO.sharegptFixture()
    Scorers.sharegptIfdPipeline(
        graft.io.JsonIO.readSharegpt(s, path)
          .select(col("conversation_id"), col("conversation")),
        "conversation_id", "conversation", () => new Scorers.ProxyBackend(42L))
      .select(col("conversation_id"), col("turn"),
        round(col("score_ifd"), 6).as("score_ifd"))
      .orderBy(col("conversation_id"), col("turn"))
  }

  private val qSharegptFileIfdSql = {
    scala.util.Try(graft.io.JsonIO.sharegptFixture())
    sharegptIfdOracle("conversation_id",
      s"""
         |  SELECT conversation_id, conversation
         |  FROM read_json('${graft.io.JsonIO.SharegptFixturePath}',
         |    format = 'newline_delimited',
         |    columns = {conversation_id: 'VARCHAR', category: 'VARCHAR',
         |               conversation: 'STRUCT(human VARCHAR, assistant VARCHAR)[]'})""".stripMargin)
  }

  // ------------------------------------- T1 apply / weighted merge
  /** TaskVector algebra breadth (reference `merging.py:52–95`):
    * base + scale · weightedMerge(0.6·tv, 0.4·(−tv)) — exercises
    * negate, the union+grouped-sum weighted merge, and apply. All
    * inputs are integer-derived doubles, so the double arithmetic is
    * exact-identical across engines. */
  private def qTaskVectorApply(implicit s: SparkSession, dir: String): DataFrame = {
    // tv feeds both merge branches and O both the diff and the apply;
    // uncached, the lineitem scan + grouped sum behind each ran 5× per
    // action (2× per tv use, 1× more for apply's base) — cache the two
    // param-sized vectors so lineitem is scanned once per status
    val o = graft.core.Caches.track(modelVec("O"))
    val tv = graft.core.Caches.track(TaskVectors.diff(modelVec("F"), o))
    val merged = TaskVectors.weightedMerge(
      Seq((tv, 0.6), (TaskVectors.negate(tv), 0.4)))
    TaskVectors.applyTo(o, merged, scale = 2.0)
      .select(col("param_key"), col("idx"), round(col("value"), 6).as("value"))
      .orderBy(col("param_key"), col("idx"))
  }

  private val qTaskVectorApplySql =
    s"""WITH f AS (${modelVecSql("F")}), o AS (${modelVecSql("O")}),
       |tv AS (
       |  SELECT f.param_key, f.idx, f.value - o.value AS value
       |  FROM f JOIN o ON f.param_key = o.param_key AND f.idx = o.idx),
       |merged AS (
       |  SELECT param_key, idx, 0.6 * value + 0.4 * (-value) AS value FROM tv)
       |SELECT o.param_key, o.idx,
       |  round(o.value + 2.0 * COALESCE(m.value, 0.0), 6) AS value
       |FROM o LEFT JOIN merged m
       |  ON o.param_key = m.param_key AND o.idx = m.idx
       |ORDER BY o.param_key, o.idx""".stripMargin

  // ------------------------------------------------ T4 max-merge TIES
  /** TIES with the max-by-magnitude disjoint merge (`merging.py:261–263`)
    * — the sibling of q_ties_merge's mean. */
  private def qTiesMergeMax(implicit s: SparkSession, dir: String): DataFrame = {
    val stacked = li.groupBy(
        col("l_returnflag").as("model"),
        concat(lit("p"), col("l_suppkey") % 4).as("param_key"),
        (col("l_partkey") % 32).cast("long").as("idx"))
      .agg(sum(when(col("l_orderkey") % 2 === 0, col("l_quantity"))
        .otherwise(-col("l_quantity"))).cast("long").cast("double").as("value"))
    TaskVectors.tiesMerge(stacked, keep = 0.2, method = "max")
      .select(col("param_key"), col("idx"), round(col("value"), 6).as("merged"))
      .orderBy(col("param_key"), col("idx"))
  }

  private val qTiesMergeMaxSql =
    """WITH stacked AS (
      |  SELECT l_returnflag AS model,
      |    'p' || CAST(l_suppkey % 4 AS VARCHAR) AS param_key,
      |    l_partkey % 32 AS idx,
      |    CAST(CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity ELSE -l_quantity END) AS BIGINT) AS DOUBLE) AS value
      |  FROM lineitem GROUP BY 1, 2, 3),
      |th AS (
      |  SELECT model, param_key, quantile_cont(abs(value), 0.8) AS th
      |  FROM stacked GROUP BY model, param_key),
      |masked AS (
      |  SELECT s.model, s.param_key, s.idx,
      |    CASE WHEN abs(s.value) >= th.th THEN s.value ELSE 0.0 END AS value
      |  FROM stacked s JOIN th ON s.model = th.model AND s.param_key = th.param_key),
      |gamma AS (
      |  SELECT param_key, idx, sign(SUM(value)) AS gamma
      |  FROM masked GROUP BY param_key, idx)
      |SELECT m.param_key, m.idx,
      |  round(MAX(CASE WHEN sign(m.value) = g.gamma AND m.value <> 0.0
      |                 THEN abs(m.value) ELSE 0.0 END) * g.gamma, 6) AS merged
      |FROM masked m JOIN gamma g ON m.param_key = g.param_key AND m.idx = g.idx
      |GROUP BY m.param_key, m.idx, g.gamma
      |ORDER BY m.param_key, m.idx""".stripMargin

  // ------------------------------- model-backed ops (md5-proxy oracle)
  /** Analysis map with the proxy model backend: ppl + embedding +
    * reward per row via one mapPartitions (per-partition init). The
    * md5-based proxy hash is natively computable by DuckDB, so even
    * the "model-backed" path gets an exact oracle. */
  private def qProxyScores(implicit s: SparkSession, dir: String): DataFrame =
    Scorers.withModelScores(
        docs.select(col("doc_id"), col("text")), "text",
        () => new Scorers.ProxyBackend(seed = 42L))
      .select(col("doc_id"), round(col("ppl_ins_alone"), 6).as("ppl_ins_alone"),
        size(col("emb_ins_alone")).as("emb_dim"),
        round(col("score_rw"), 6).as("score_rw"))
      .orderBy(col("doc_id"))

  private val qProxyScoresSql = {
    import Scorers.ProxyBackend.unitSql
    s"""SELECT doc_id,
       |  round(2.0 + 30.0 * ${unitSql(42L, "'ppl:' || text")}, 6) AS ppl_ins_alone,
       |  CAST(64 AS INTEGER) AS emb_dim,
       |  round(4.0 * ${unitSql(42L, "'rw:#' || text")} - 2.0, 6) AS score_rw
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Full IFD pipeline over an alpaca view of the corpus (template →
    * token losses → guarded ratio). */
  private def qIfdFull(implicit s: SparkSession, dir: String): DataFrame = {
    val alpaca = docs.select(
      col("doc_id"),
      substring(col("text"), 1, 60).as("instruction"),
      when(col("source") === "src0", lit("")).otherwise(col("source")).as("input"),
      col("text").as("output"))
    Scorers.ifdPipeline(alpaca, () => new Scorers.ProxyBackend(42L))
      .select(col("doc_id"), round(col("score_ifd"), 6).as("score_ifd"))
      .orderBy(col("doc_id"))
  }

  private val qIfdFullSql = {
    import Scorers.ProxyBackend.unitSql
    val t1 = TextFns.TemplateNoInput.replace("'", "''")
    val t2 = TextFns.TemplateWithInput.replace("'", "''")
    def losses(prompt: String) =
      s"""list_transform(toks, (t, i) ->
         |      0.05 + 4.0 * ${unitSql(42L, s"'tl:' || $prompt || '#' || t || '#' || (i - 1)")})""".stripMargin
    s"""WITH alp AS (
       |  SELECT doc_id,
       |    CASE WHEN COALESCE(NULLIF(source, 'src0'), '') = ''
       |      THEN printf('$t1', substr(text, 1, 60))
       |      ELSE printf('$t2', substr(text, 1, 60), source)
       |    END AS prompt,
       |    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |sc AS (
       |  SELECT doc_id,
       |    ${losses("''")} AS la,
       |    ${losses("prompt")} AS lc
       |  FROM alp
       |  WHERE len(string_split_regex(trim(prompt), '\\s+')) < 1024),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN len(la) = 0 OR len(lc) = 0 THEN NULL
       |      ELSE (list_aggregate(lc, 'sum') / len(lc))
       |         / (list_aggregate(la, 'sum') / len(la)) END AS score
       |  FROM sc)
       |SELECT doc_id, round(score, 6) AS score_ifd FROM r
       |WHERE score IS NULL OR score <= 1.0
       |ORDER BY doc_id""".stripMargin
  }

  /** LESS-style selection: long-format pseudo-gradients, similarity
    * against the mean validation gradient, top-20 examples. */
  private def qGradientTopK(implicit s: SparkSession, dir: String): DataFrame = {
    val grads = Scorers.gradientRows(
      docs.select(col("doc_id"), col("text")), "doc_id", "text",
      paramKeys = Seq("layer0.weight", "layer1.weight"), entriesPerKey = 8,
      make = () => new Scorers.ProxyBackend(7L))
    val valGrad = grads.where(col("example_id") % 10 === 0)
      .groupBy(col("param_key"), col("idx"))
      .agg(avg(col("value")).as("value"))
    TaskVectors.gradientSimilarityTopK(grads, valGrad, 20)
      .select(col("example_id"), round(col("sim"), 6).as("sim"))
  }

  private val qGradientTopKSql = {
    import Scorers.ProxyBackend.unitSql
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '') AS toks
       |  FROM documents),
       |losses AS (
       |  SELECT doc_id,
       |    list_transform(toks, (t, i) ->
       |      0.05 + 4.0 * ${unitSql(7L, "'tl:#' || t || '#' || (i - 1)")}) AS ll
       |  FROM tok),
       |grads AS (
       |  SELECT doc_id AS example_id, param_key, idx,
       |    CASE WHEN len(ll) = 0 THEN 0.0
       |      ELSE ll[(idx % len(ll)) + 1] * (1.0 / (1 + idx)) - 0.5 END AS value
       |  FROM losses
       |  CROSS JOIN (SELECT unnest(['layer0.weight', 'layer1.weight']) AS param_key)
       |  CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS idx)),
       |vg AS (
       |  SELECT param_key, idx, avg(value) AS value
       |  FROM grads WHERE example_id % 10 = 0 GROUP BY 1, 2),
       |sims AS (
       |  SELECT g.example_id, SUM(g.value * v.value) AS sim
       |  FROM grads g JOIN vg v ON g.param_key = v.param_key AND g.idx = v.idx
       |  GROUP BY 1)
       |SELECT example_id, round(sim, 6) AS sim FROM sims
       |ORDER BY sim DESC, example_id LIMIT 20""".stripMargin
  }

  override def queries: Seq[Q] = Seq(
    Q("q_len_score", (s, d) => qLenScore(s, d), Some(qLenScoreSql)),
    Q("q_prompt_template", (s, d) => qPromptTemplate(s, d), Some(qPromptTemplateSql)),
    Q("q_sharegpt_turns", (s, d) => qSharegptTurns(s, d), Some(qSharegptTurnsSql)),
    Q("q_sharegpt_file", (s, d) => qSharegptFile(s, d), Some(qSharegptFileSql)),
    Q("q_sharegpt_ifd", (s, d) => qSharegptIfd(s, d), Some(qSharegptIfdSql)),
    Q("q_sharegpt_multiturn", (s, d) => qSharegptMultiturn(s, d), Some(qSharegptMultiturnSql)),
    Q("q_sharegpt_file_ifd", (s, d) => qSharegptFileIfd(s, d), Some(qSharegptFileIfdSql)),
    Q("q_ifd_ratio", (s, d) => qIfdRatio(s, d), Some(qIfdRatioSql)),
    Q("q_cluster_select", (s, d) => qClusterSelect(s, d), Some(qClusterSelectSql)),
    Q("q_sample_least_conf", (s, d) => qSampleLeastConf(s, d), Some(qSampleLeastConfSql)),
    Q("q_sample_random", (s, d) => qSampleRandom(s, d), Some(qSampleRandomSql)),
    Q("q_taskvector_diff", (s, d) => qTaskVectorDiff(s, d), Some(qTaskVectorDiffSql)),
    Q("q_taskvector_apply", (s, d) => qTaskVectorApply(s, d), Some(qTaskVectorApplySql)),
    Q("q_ties_merge", (s, d) => qTiesMerge(s, d), Some(qTiesMergeSql)),
    Q("q_ties_merge_max", (s, d) => qTiesMergeMax(s, d), Some(qTiesMergeMaxSql)),
    Q("q_proxy_scores", (s, d) => qProxyScores(s, d), Some(qProxyScoresSql)),
    Q("q_ifd_full", (s, d) => qIfdFull(s, d), Some(qIfdFullSql)),
    Q("q_gradient_topk", (s, d) => qGradientTopK(s, d), Some(qGradientTopKSql)))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, Expression,
  GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.CatalystBridge

/** The fourth whole-operator custom-plan path (after
  * [[AsofJoinNative]], [[RangeJoinNative]], [[LshBandJoinNative]]):
  * native WITHIN-GROUP ordered-pair enumeration WITH PAYLOAD — the
  * verify stage of semantic dedup. The composed shape
  * ([[graft.operators.Similarity.semanticDedup]]) self-joins the
  * Lloyd's-labeled frame on its cluster id to test every
  * within-cluster pair's cosine: Spark exchanges the SAME labeled
  * table twice (one per join alias), sorts both, and the sort-merge
  * join buffers one side's whole cluster as full rows. This node is
  * UNARY: the labeled table is shuffled ONCE on the group key
  * (declared via `requiredChildDistribution`, so EnsureRequirements
  * owns — and can reuse — the Exchange), sorted (key, id) within
  * partitions, and a single streaming pass emits each group's ordered
  * (id_a, payload_a, id_b, payload_b) rows — `a < b` falls out of
  * the id sort order, and a group's pairs stream out lazily.
  *
  * The payload rides along so the SIMILARITY PREDICATE stays a normal
  * codegen'd Filter ABOVE the node (the same
  * [[graft.plans.ArrayCosineSim]] expression, bit-identical to the
  * composed query and the DuckDB oracle) — the node owns pair
  * enumeration, Catalyst owns the math. That keeps it reusable for
  * any within-group pairwise verify (cosine, Jaccard on signatures,
  * edit-distance prefilters), not just this query's.
  *
  * Memory: one group's (id, payload) values — the sort-merge join
  * buffers the same group as full rows, so this is never worse, and
  * it removes one Exchange and one sort of the corpus-shaped labeled
  * table. In the production collapse-first path the input is the
  * representative set, so a group is reps-of-one-cluster sized.
  *
  * Production status, set by measurement (ScaleSmoke
  * `cluster_{enum,verify}_*`, 25 M pairs): whole-stage-codegen'd
  * join+filter out-enumerates and out-verifies this node's per-pair
  * virtual predicate eval 2–4× in BOTH the broadcast and forced-SMJ
  * regimes, so [[graft.operators.Similarity.semanticDedupScalable]]
  * keeps the composed self-join and this node is the GATED
  * CAPABILITY (`q_dedup_semantic_native`, identical oracle) and the
  * reusable within-group-pairs building block — the inverse of the
  * [[LshBandJoinNative]] call, where the isolated native stage
  * measured 1.3× faster and became the production path. Same
  * method both times: build, A/B isolated + whole-query, route
  * production through the winner.
  *
  * NULL semantics match the equi-join it replaces: rows with a null
  * group key or null id never pair (NULL never equi-matches / the
  * strict `<` drops id ties); a null PAYLOAD still pairs, exactly as
  * a joined row with a null embedding would (its cosine is null and
  * the filter above drops it — the composed query's behavior).
  *
  * Reference behavior: muyu42/DataS deduplicates its pool before
  * selection (`main.py:402-482`); cluster-then-verify is the standard
  * public semantic-dedup recipe (Abbas et al., SemDeDup, 2023).
  */
case class ClusterPairsPlan(
    key: Expression, docId: Expression, payload: Expression,
    outIdA: Attribute, outPayA: Attribute,
    outIdB: Attribute, outPayB: Attribute,
    pred: Option[Expression],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] =
    Seq(outIdA, outPayA, outIdB, outPayB)
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): ClusterPairsPlan = copy(child = newChild)
}

case class ClusterPairsExec(
    key: Expression, docId: Expression, payload: Expression,
    outIdA: Attribute, outPayA: Attribute,
    outIdB: Attribute, outPayB: Attribute,
    pred: Option[Expression],
    child: SparkPlan) extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] =
    Seq(outIdA, outPayA, outIdB, outPayB)
  override def producedAttributes: AttributeSet = AttributeSet(output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil

  /** id as the secondary sort key: ascending ids inside a group make
    * pair order (a < b) positional — no comparison per emitted pair. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(key, Ascending), SortOrder(docId, Ascending)))

  override protected def withNewChildInternal(
      newChild: SparkPlan): ClusterPairsExec = copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExpr = key
    val idExpr = docId
    val payExpr = payload
    val idType = docId.dataType
    val payType = payload.dataType
    val inSchema = child.output
    val outSchema = output
    val predExpr = pred
    child.execute().mapPartitionsWithIndex({ (pidx, iter) =>
      val keyProj = UnsafeProjection.create(Seq(keyExpr), inSchema)
      val idPayProj = UnsafeProjection.create(Seq(idExpr, payExpr), inSchema)
      val resultProj = UnsafeProjection.create(outSchema, outSchema)
      // the pushed pair predicate evaluates on the REUSED pair row
      // BEFORE any UnsafeRow materialization — only survivors pay the
      // per-pair payload copy (the composed SMJ gets the same effect
      // from its codegen'd filter over a JoinedRow)
      val boundPred = predExpr.map { e =>
        val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(
          org.apache.spark.sql.catalyst.expressions.BindReferences
            .bindReference(e, outSchema))
        p.initialize(pidx)
        p
      }
      val idOrd = TypeUtils.getInterpretedOrdering(idType)
      val isLong = idType == org.apache.spark.sql.types.LongType
      // hoisted out of the per-pair loop: Option.forall would cost a
      // megamorphic closure call per candidate pair
      val predOrNull = boundPred.orNull
      val pairRow = new GenericInternalRow(4)

      // next valid (non-null key/id) row; key + values copied out of
      // the projections' reused buffers
      var headKey: InternalRow = null
      var headId: Any = null
      var headPay: Any = null
      def advance(): Unit = {
        headKey = null; headId = null; headPay = null
        while (headKey == null && iter.hasNext) {
          val row = iter.next()
          val k = keyProj(row)
          if (!k.isNullAt(0)) {
            val v = idPayProj(row)
            if (!v.isNullAt(0)) {
              val copied = v.copy()
              headKey = k.copy()
              headId = copied.get(0, idType)
              headPay = if (copied.isNullAt(1)) null else copied.get(1, payType)
            }
          }
        }
      }
      advance()

      new Iterator[InternalRow] {
        // current group's (id, payload) values, id-ascending;
        // idsL mirrors ids unboxed when the id type is LongType so
        // the per-pair duplicate-skip compare is primitive (the
        // interpreted ordering on boxed Longs was the enumeration
        // hot spot at 25M pairs — same fix as LshBandPairsExec's
        // long fast path)
        private var ids: Array[Any] = Array.empty
        private var idsL: Array[Long] = Array.emptyLongArray
        private var pays: Array[Any] = Array.empty
        private var i = 0 // pair cursor: a = ids(i)
        private var j = 1 //              b = ids(j)

        private def loadNextGroup(): Unit = {
          while (headKey != null) {
            val k0 = headKey
            val idBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
            val payBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
            while (headKey != null && headKey == k0) { // UnsafeRow equals = bytes
              idBuf += headId
              payBuf += headPay
              advance()
            }
            if (idBuf.length >= 2) {
              ids = idBuf.toArray; pays = payBuf.toArray; i = 0; j = 1
              if (isLong) {
                idsL = new Array[Long](ids.length)
                var x = 0
                while (x < ids.length) {
                  idsL(x) = ids(x).asInstanceOf[Long]; x += 1
                }
              }
              return
            }
          }
          ids = Array.empty; idsL = Array.emptyLongArray
          pays = Array.empty; i = 0; j = 1
        }

        private def sameId(a: Int, b: Int): Boolean =
          if (isLong) idsL(a) == idsL(b)
          else idOrd.compare(ids(a), ids(b)) == 0

        private def positioned(): Boolean = {
          while (true) {
            while (i < ids.length - 1) {
              // strict < of the composed join: equal ids (adjacent in
              // the sort) never self-pair
              while (j < ids.length && sameId(i, j)) j += 1
              if (j < ids.length) return true
              i += 1; j = i + 1
            }
            if (headKey == null) return false
            loadNextGroup()
            if (ids.isEmpty) return false
          }
          false
        }

        /** position on the next pair that PASSES the pushed
          * predicate (if any), loading pairRow as a side effect. */
        private def positionedMatching(): Boolean = {
          while (positioned()) {
            pairRow.update(0, ids(i))
            pairRow.update(1, pays(i))
            pairRow.update(2, ids(j))
            pairRow.update(3, pays(j))
            if (predOrNull == null || predOrNull.eval(pairRow)) return true
            j += 1
            if (j >= ids.length) { i += 1; j = i + 1 }
          }
          false
        }

        override def hasNext: Boolean = positionedMatching()
        override def next(): InternalRow = {
          if (!positionedMatching()) throw new NoSuchElementException
          j += 1
          if (j >= ids.length) { i += 1; j = i + 1 }
          resultProj(pairRow)
        }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[ClusterPairsPlan]] to [[ClusterPairsExec]]. */
object ClusterPairsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case ClusterPairsPlan(k, i, p, a1, a2, b1, b2, pr, child) =>
      ClusterPairsExec(k, i, p, a1, a2, b1, b2, pr, planLater(child)) :: Nil
    case _ => Nil
  }
}

object ClusterPairsNative {

  /** All within-group ordered pairs (id_a < id_b) of
    * `labeled(keyCol, idCol, payCol)` with both payloads, through the
    * custom unary operator — the native replacement for
    * `labeled JOIN labeled ON key` + `id_a < id_b`. The child is
    * pre-projected to the three columns — the node is opaque to
    * Catalyst's column pruning, so pruning happens by construction.
    *
    * `payPred`: optional pair predicate over (pay_a, pay_b), PUSHED
    * INTO the node and evaluated on the reused pair row BEFORE any
    * UnsafeRow materialization. Without it, every candidate pair
    * pays a copy of both payloads only for a Filter above to drop
    * ~97% of them (the composed SMJ avoids that by filtering over a
    * JoinedRow) — measured 2.8× slower than the self-join at 25 M
    * pairs; with the pushed predicate only survivors materialize.
    * The predicate's interpreted eval is contract-identical to its
    * codegen (Spark's Expression eval/doGenCode parity), so results
    * match the `.where` form bit-for-bit — gate-asserted. */
  def clusterPairs(labeled: DataFrame, keyCol: String, idCol: String,
                   payCol: String,
                   payPred: Option[(Expression, Expression) => Expression] = None)
      : DataFrame = {
    val spark = labeled.sparkSession
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(ClusterPairsStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ ClusterPairsStrategy
    }
    val plan = CatalystBridge.analyzed(
      labeled.select(keyCol, idCol, payCol))
    val Seq(key, id, pay) = plan.output
    val payA = AttributeReference("pay_a", pay.dataType, nullable = true)()
    val payB = AttributeReference("pay_b", pay.dataType, nullable = true)()
    CatalystBridge.ofRows(labeled, ClusterPairsPlan(
      key, id, pay,
      AttributeReference("id_a", id.dataType, nullable = false)(),
      payA,
      AttributeReference("id_b", id.dataType, nullable = false)(),
      payB,
      payPred.map(f => f(payA, payB)),
      plan))
  }
}

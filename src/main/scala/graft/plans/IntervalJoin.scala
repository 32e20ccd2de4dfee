package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native INTERVAL (range) join — the second whole-operator (c)-tier
  * extension beside [[AsOfJoinPlan]]: for each left row, ALL right rows
  * with equal key whose time falls in the left row's `[lo, hi]` window —
  * the stream-enrichment shape ("every event of this user within 5
  * minutes of the session start").
  *
  * Why built-ins can't express the efficient plan: Spark plans an
  * equi-key + range-predicate join as SortMergeJoin with the range as a
  * per-key-group POST-FILTER — it enumerates all |Lk| x |Rk| pairs of
  * every key group and discards the misses, so a hot key pays quadratic
  * work for output that is usually near-linear. This operator exploits
  * the sort BOTH ways: with the right side time-ordered within each key,
  * each left row binary-searches its window start and scans exactly its
  * matches — per key group O((|Lk| + |Rk|) log + |output|), never
  * |Lk| x |Rk|. (`IntervalJoinSpec` pins result-parity with the
  * SMJ-composed form and the plan shape; the hot-key probe measures the
  * separation.)
  *
  *   - Both children declare `ClusteredDistribution` on the join keys, so
  *     `EnsureRequirements` co-partitions them with the same hash
  *     exchange a plain equi-join pays;
  *   - per-child `(keys, time)` orderings are planner-inserted spillable
  *     sorts;
  *   - execution holds ONE right-side key group in memory (the same
  *     per-key build assumption a shuffled hash join makes); the left
  *     side streams.
  *
  * Semantics: INNER join, window inclusive both ends. SQL null rules: a
  * NULL key equals nothing, a NULL window bound or right time makes the
  * predicate unknown — such rows match nothing and are skipped.
  */
case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftLo: Expression, leftHi: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[IntervalJoinPlan]] as [[IntervalJoinExec]]; injected via
  * [[IntervalJoin.join]] or [[graft.GraftExtensions]].
  */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, lk, rk, lo, hi, rt) =>
      IntervalJoinExec(planLater(l), planLater(r), lk, rk, lo, hi, rt) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftLo: Expression, leftHi: Expression, rightTime: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftLo, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftLo, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val fullOutput = output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lLo = leftLo
    val lHi = leftHi
    val rTime = rightTime
    // The one-group-in-memory assumption is a real bound, not a docstring:
    // a right key group larger than this fails the task with a clear
    // message instead of an opaque executor OOM (the SMJ-composed form
    // from IntervalJoinSpec is the spillable fallback for such data).
    val maxGroupRows = conf.getConfString(
      IntervalJoinExec.MaxGroupRowsKey, "8000000").toLong
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val loBound = BindReferences.bindReference(lLo, lOutput)
      val hiBound = BindReferences.bindReference(lHi, lOutput)
      val rtBound = BindReferences.bindReference(rTime, rOutput)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(fullOutput, fullOutput)

      // right-side cursor, one row ahead
      var rHead: InternalRow = null
      var rHeadKey: UnsafeRow = null
      def advanceRight(): Unit = {
        // NULL right keys or times can never match — skip at the cursor
        var settled = false
        while (!settled) {
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
            settled = !rHeadKey.anyNull && rtBound.eval(rHead) != null
          } else { rHead = null; rHeadKey = null; settled = true }
        }
      }
      advanceRight()

      // the buffered right key group: times ascending (child ordering)
      var groupKey: UnsafeRow = null
      val groupTimes = new scala.collection.mutable.ArrayBuffer[Long]
      val groupRows = new scala.collection.mutable.ArrayBuffer[InternalRow]
      def loadGroup(lk: UnsafeRow): Unit = {
        if (groupKey != null && keyOrd.compare(groupKey, lk) == 0) return
        groupKey = null; groupTimes.clear(); groupRows.clear()
        while (rHead != null && keyOrd.compare(rHeadKey, lk) < 0) advanceRight()
        if (rHead != null && keyOrd.compare(rHeadKey, lk) == 0) {
          groupKey = lk.copy()
          while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0) {
            if (groupRows.length >= maxGroupRows)
              throw new IllegalStateException(
                s"IntervalJoin: right-side key group exceeds " +
                s"${IntervalJoinExec.MaxGroupRowsKey}=$maxGroupRows rows; " +
                "raise the cap or rewrite as the SMJ-composed range join " +
                "for this key distribution")
            groupTimes += rtBound.eval(rHead).asInstanceOf[Long]
            groupRows += rHead.copy()
            advanceRight()
          }
        }
      }
      // lower bound: first index in groupTimes with time >= lo
      def lowerBound(lo: Long): Int = {
        var a = 0; var b = groupTimes.length
        while (a < b) {
          val m = (a + b) >>> 1
          if (groupTimes(m) < lo) a = m + 1 else b = m
        }
        a
      }

      lIter.flatMap { l =>
        val lk = lKeyProj(l).copy()
        val loEval = loBound.eval(l)
        val hiEval = hiBound.eval(l)
        if (lk.anyNull || loEval == null || hiEval == null) Iterator.empty
        else {
          val lo = loEval.asInstanceOf[Long]
          val hi = hiEval.asInstanceOf[Long]
          loadGroup(lk)
          if (groupKey == null || hi < lo) Iterator.empty
          else {
            val start = lowerBound(lo)
            new Iterator[InternalRow] {
              private var i = start
              override def hasNext: Boolean =
                i < groupTimes.length && groupTimes(i) <= hi
              override def next(): InternalRow = {
                val r = groupRows(i); i += 1
                resultProj(joined(l, r))
              }
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinExec {
  /** Hard cap on the buffered right-side key group (rows); exceeded →
    * task fails with a clear message instead of OOMing the executor.
    */
  val MaxGroupRowsKey = "spark.graft.intervalJoin.maxGroupRows"
}

/** Public entry point: `IntervalJoin.join(sessions, events, "user_id",
  * "e_user", "start_ts", "end_ts", "e_ts")` — resolves named columns
  * against each side's analyzed output and hands Catalyst the logical
  * node; the planner strategy registers on the session idempotently.
  */
object IntervalJoin {

  /** Build the logical node from the two sides' ANALYZED plans — shared
    * by [[join]] and the `interval_join(...)` SQL table-valued form
    * registered through [[graft.GraftExtensions]].
    */
  def plan(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftLo: String, leftHi: String, rightTime: String): LogicalPlan = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def res(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    IntervalJoinPlan(lp, rp, Seq(res(lp, leftKey)), Seq(res(rp, rightKey)),
      res(lp, leftLo), res(lp, leftHi), res(rp, rightTime))
  }

  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftLo: String, leftHi: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    GraftPlanBridge.addStrategy(spark, IntervalJoinStrategy)
    GraftPlanBridge.ofRows(spark,
      plan(left, right, leftKey, rightKey, leftLo, leftHi, rightTime))
  }
}

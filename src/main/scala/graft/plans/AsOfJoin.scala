package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join: for each left row, the latest right row with the
  * same key and `rightTime <= leftTime` (LEFT OUTER: unmatched left rows
  * null-extend the right side).
  *
  * This is the one operator family the reference-class engines ship that
  * Spark's logical algebra cannot name directly (DuckDB: `ASOF JOIN`;
  * Pandas: `merge_asof`). q33 expresses it compositionally (tag + union +
  * one window) — correct and one-shuffle, but it pays for the union
  * materialization, null-padded carrier columns on every row, and a
  * WindowExec whose frame machinery is overkill for "carry one value
  * forward". This file is the whole-operator extension path from the
  * build plan's preference order (custom LogicalPlan + Strategy +
  * SparkPlan via SparkSessionExtensions), used exactly where composition
  * has measurable overhead:
  *
  *  - '''Logical''': [[AsOfJoinPlan]], an opaque resolved BinaryNode.
  *  - '''Planning''': [[AsOfJoinStrategy]] (injected by GraftExtensions)
  *    maps it 1:1 onto [[AsOfJoinExec]].
  *  - '''Physical''': AsOfJoinExec declares
  *    `ClusteredDistribution(keys)` + `(keys, time)` child ordering and
  *    lets EnsureRequirements plan the exchanges/sorts — the SAME
  *    machinery SortMergeJoinExec uses, so AQE, co-partitioning reuse and
  *    skew handling all apply unchanged. Per partition it is then a
  *    single streaming merge: advance the right iterator while its
  *    (key, time) is ≤ the current left row, remembering only the last
  *    equal-key right row. State per partition = ONE buffered right row —
  *    no window frame, no per-key buffering, no union. At 100 TB the
  *    cost is exactly two hash exchanges + two in-partition sorts,
  *    identical asymptotics to q33's form but with a constant-factor
  *    lighter inner loop and half the shuffled width (each side ships
  *    only its own columns; the union form ships the padded superset).
  *
  * Semantics notes (spec-asserted in AsOfJoinSpec):
  *  - keys and times must be non-null on both sides (null keys never
  *    match in SQL equality; callers filter, as q33 does).
  *  - duplicate right (key, time) rows make "the" latest row ambiguous —
  *    callers dedup the right side first (q33 does; AsOfJoinSpec pins
  *    the requirement).
  *  - the node is opaque to ColumnPruning: callers project the columns
  *    they need BEFORE joining (both registered call sites do).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key and matching key arity")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key types must match pairwise: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types must match: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec, children planned later. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned, merge-based, O(1) state per
  * partition. See [[AsOfJoinPlan]] for the design rationale.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Same contract as SortMergeJoinExec: each child clustered on its keys;
  // EnsureRequirements picks ONE partition count for both sides, so equal
  // key values land in the same partition index (hash of the value at the
  // same key position). Existing compatible partitionings are reused —
  // a child already hash-partitioned on the keys plans zero exchanges.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Executor-side, per-partition codegen'd projections. Key rows from
      // both sides share a schema, so one natural ordering compares them.
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightOutput.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // The entire merge state: the last equal-key right row consumed
      // (copied — Spark row iterators reuse their row object) + its key.
      var lastMatch: InternalRow = null
      var matchKey: UnsafeRow = null
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val lt = lTimeProj(lRow)
        // Both inputs are (key, time)-sorted, so the right cursor only
        // ever moves forward: drop right rows with a smaller key; consume
        // equal-key rows up to the left row's time, each replacing
        // lastMatch (later time wins); stop at the first row beyond.
        var scan = true
        while (scan && rBuf.hasNext) {
          val c = keyOrd.compare(rKeyProj(rBuf.head), lk)
          if (c < 0) rBuf.next()
          else if (c == 0 && timeOrd.compare(rTimeProj(rBuf.head), lt) <= 0) {
            lastMatch = rBuf.next().copy()
            matchKey = lk.copy()
          } else scan = false
        }
        val m =
          if (matchKey != null && keyOrd.compare(matchKey, lk) == 0) {
            numMatched += 1
            lastMatch
          } else nullRight
        numOutputRows += 1
        resultProj(joined(lRow, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point for the native as-of join. */
object AsOf {

  /** LEFT OUTER as-of join of `left` to `right` on equal `keys`
    * (left-name → right-name pairs) with `rightTime <= leftTime`,
    * latest right row winning. Output = left columns ++ right columns
    * (right side nullable).
    *
    * The two inputs must not share attribute instances (Spark's analyzer
    * dedups self-joins only for its own Join node) — re-read the table or
    * alias every column to get fresh ids; this fails loudly rather than
    * silently mis-binding.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side column '$name' not found in (${plan.output.map(_.name).mkString(", ")})"))
    val conflicts = lPlan.outputSet.intersect(rPlan.outputSet)
    require(conflicts.isEmpty,
      s"as-of join inputs share attributes $conflicts — re-read or re-alias the right side")
    GraftSqlShim.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        keys.map(k => resolve(lPlan, k._1, "left")),
        keys.map(k => resolve(rPlan, k._2, "right")),
        resolve(lPlan, leftTimeCol, "left"),
        resolve(rPlan, rightTimeCol, "right")))
  }
}

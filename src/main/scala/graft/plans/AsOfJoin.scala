package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftSql

/** As-of join as a WHOLE custom operator — logical node, planner
  * strategy, and physical exec — registered through
  * `GraftExtensions.injectPlannerStrategy`. This is the operator
  * time-series engines ship natively (pandas `merge_asof`, kdb `aj`,
  * QuestDB `ASOF JOIN`) and Spark lacks: each left row is joined to the
  * LAST right row of the same key whose time is <= (or < when
  * `strict`) the left row's time.
  *
  * Physical semantics (`AsOfJoinExec`):
  *   - `requiredChildDistribution` clusters BOTH children on the join
  *     key, so Catalyst's EnsureRequirements co-partitions them under
  *     one pair of hash exchanges (exactly the sort-merge-join shape —
  *     never a broadcast nested loop, never a cartesian);
  *   - `requiredChildOrdering` sorts each partition by (key, time), so
  *     the join itself is ONE forward-only streaming merge per
  *     partition: O(nL + nR), zero state beyond the single candidate
  *     row, no per-key buffering;
  *   - output ordering (key, leftTime) is preserved and advertised, so
  *     a downstream window or as-of over the same key reuses the sort.
  *
  * At 100 TB this plans identically to a sort-merge join: two hash
  * exchanges on the key (AQE-coalesced/skew-split like any other), one
  * sort per side, and a merge that never materializes a per-key group —
  * in contrast to the window-form composition (q61) whose
  * `last(_, ignoreNulls)` must carry every event of a user through the
  * window frame. The window form remains the oracle; q139 proves the
  * operator gives the identical answer through the driver's DuckDB gate.
  *
  * Reference behavior: `merge_asof`'s `allow_exact_matches` maps to
  * `!strict`, and its `tolerance` to [[AsOfJoinPlan.tolerance]]: when
  * set, a left row only matches a right row at most `tolerance` units
  * back in time (units of the time type's NATIVE representation —
  * microseconds for timestamps, days for dates, the value itself for
  * integral columns). Unmatched left rows keep null right columns
  * (left-outer as-of). Null keys and null times never match, matching
  * SQL join null semantics.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    strict: Boolean,
    rightTiebreak: Option[Attribute] = None,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, strict, tb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, strict, tb, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    strict: Boolean,
    rightTiebreak: Option[Attribute] = None,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  require(leftKey.dataType == rightKey.dataType,
    s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
  tolerance.foreach { t =>
    require(t >= 0, s"as-of tolerance must be >= 0, got $t")
    import org.apache.spark.sql.types._
    require(Seq(TimestampType, TimestampNTZType, DateType, LongType,
      IntegerType, ShortType, ByteType).contains(leftTime.dataType),
      s"as-of tolerance needs an integral-backed time type, " +
        s"got ${leftTime.dataType}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Right rows sharing (key, time) are absorbed in partition-sort
    * order and the LAST one wins; without `rightTiebreak` that order —
    * and so the matched row's non-time columns — is unspecified across
    * runs. Passing a unique tiebreak column (e.g. an event id) pins it:
    * the match is then the tied row with the GREATEST tiebreak value. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // house standard for exec nodes: row counts surfaced in the SQL UI
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeOrd = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeOrd = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val isStrict = strict
    val tolOpt = tolerance
    val numLeft = left.output.size
    val numRight = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrdering = TypeUtils.getInterpretedOrdering(timeType)
      // exec rows are reused buffers; the merge peeks and retains, so
      // copy on the buffered (right) side only — the left streams through
      val rRows = rIter.map(_.copy()).buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(numRight)
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIter.map { lRow =>
        val lk = lRow.get(lKeyOrd, keyType)
        val lt = lRow.get(lTimeOrd, timeType)
        var matched: InternalRow = null
        if (lk != null) {
          // discard rights strictly before this key (null keys first in
          // the sort; they can never match, so they fall out here too)
          var advancing = true
          while (advancing && rRows.hasNext) {
            val rk = rRows.head.get(rKeyOrd, keyType)
            if (rk == null || keyOrdering.compare(rk, lk) < 0) rRows.next()
            else advancing = false
          }
          // within the key group, absorb every right at-or-before lt
          // (null right times sort first and never match — skip them);
          // left times ascend within the key, so the pointer only moves
          // forward and the last absorbed row is the as-of match
          if (lt != null) {
            advancing = true
            while (advancing && rRows.hasNext) {
              val head = rRows.head
              val rk = head.get(rKeyOrd, keyType)
              if (rk != null && keyOrdering.compare(rk, lk) == 0) {
                val rt = head.get(rTimeOrd, timeType)
                if (rt == null) rRows.next()
                else {
                  val c = timeOrdering.compare(rt, lt)
                  if (c < 0 || (c == 0 && !isStrict)) {
                    lastMatch = rRows.next()
                    lastMatchKey = lk
                  } else advancing = false
                }
              } else advancing = false
            }
          }
          if (lastMatch != null && lastMatchKey != null &&
            keyOrdering.compare(lastMatchKey, lk) == 0 && lt != null) {
            // with a tolerance the last absorbed right is the ONLY
            // candidate (any earlier one is farther back in time), so
            // the bound is one subtraction on the integral-backed
            // internal values — never a second scan
            matched = tolOpt match {
              case None => lastMatch
              case Some(tol) =>
                val rt = lastMatch.get(rTimeOrd, timeType)
                if (rt != null &&
                  AsOfJoinExec.timeAsLong(lt) - AsOfJoinExec.timeAsLong(rt) <= tol)
                  lastMatch
                else null
            }
          }
        }
        numOutputRows += 1
        if (matched != null) numMatched += 1
        project(joined(lRow, if (matched != null) matched else nullRight))
      }
    }
  }
}

object AsOfJoinExec {
  /** Internal value of an integral-backed time column (micros for
    * timestamps, days for dates) — the representation the tolerance
    * bound subtracts in. */
  private[plans] def timeAsLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
    case other => throw new IllegalStateException(
      s"non-integral as-of time value: $other (${other.getClass})")
  }
}

/** Public API: `AsOf.join(left, right, ...)` — the DataFrame-level
  * entry that builds the custom logical node. Right-side attributes are
  * re-aliased when the two plans share expression ids (the self-join
  * case), mirroring what the analyzer does for `Join`. */
object AsOf {
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      strict: Boolean = false,
      rightTiebreak: Option[String] = None,
      tolerance: Option[Long] = None): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rightSafe =
      if (left.queryExecution.analyzed.outputSet
        .intersect(right.queryExecution.analyzed.outputSet).nonEmpty)
        right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
      else right
    val rPlan = rightSafe.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    GraftSql.ofRows(left.sparkSession, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime), strict,
      rightTiebreak.map(attr(rPlan, _)), tolerance))
  }
}

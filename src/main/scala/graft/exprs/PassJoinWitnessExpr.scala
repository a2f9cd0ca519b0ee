package graft.exprs

import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The exactly-once predicate of the PassJoin rewrite
  * ([[graft.plans.FuzzyJoinRewrite]]): true iff (i, pos) is the CANONICAL
  * segment-match witness of the pair — the first (segment index ascending,
  * then position ascending) candidate the rewrite's probe generation emits
  * that actually matches.
  *
  * A pair within edit distance d can match on several (segment, shifted
  * position) candidates, and a blocked equi-join would emit the pair once
  * per match — but the original inner join emits each qualifying pair
  * exactly once, and an optimizer rewrite has no row identity to dedupe
  * with. Keeping only the canonical witness restores exactly-once without
  * a Distinct: the witness is recomputed per joined row FROM THE TWO
  * STRINGS ALONE (deterministic), so exactly one of a pair's candidate
  * rows survives, and the pigeonhole guarantees a witness exists whenever
  * the residual edit-distance predicate holds.
  *
  * The generation rule mirrored here (MUST stay in lockstep with the
  * rewrite and [[graft.operators.FuzzyJoin]]'s partition rule): p = d+1
  * segments of the right string (first p - len%p of floor(len/p) chars,
  * the rest one longer), probe positions start±d clamped to the left
  * string, code-point substring comparison (Spark Substring semantics). */
case class PassJoinWitness(first: Expression, second: Expression,
                           third: Expression, fourth: Expression, d: Int)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType && fourth.dataType == IntegerType && d >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pass_join_witness expects (string, string, int, int) with d >= 1")

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(s1: Any, s2: Any, i: Any, pos: Any): Any =
    PassJoinWitness.isCanonical(s1.asInstanceOf[UTF8String], s2.asInstanceOf[UTF8String],
      i.asInstanceOf[Int], pos.asInstanceOf[Int], d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s1, s2, i, pos) =>
      s"${ev.value} = graft.exprs.PassJoinWitness.isCanonical($s1, $s2, $i, $pos, $d);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object PassJoinWitness {

  /** (start, slen) of segment `i` in a `p`-partition of length `len` —
    * the FuzzyJoin.segOf rule. */
  private def seg(len: Int, i: Int, p: Int): (Int, Int) = {
    val base = len / p
    val rem = len % p
    val start = i * base + math.max(0, i - (p - rem))
    val slen = base + (if (i >= p - rem) 1 else 0)
    (start, slen)
  }

  /** true iff (i, pos) is the first (i asc, pos asc) valid matching
    * candidate for the pair (a = probe string, b = indexed string). */
  def isCanonical(a: UTF8String, b: UTF8String, i: Int, pos: Int, d: Int): Boolean = {
    val p = d + 1
    val la = a.numChars()
    val lr = b.numChars()
    var ci = 0
    while (ci < p) {
      val (start, slen) = seg(lr, ci, p)
      val segStr = b.substring(start, start + slen)
      var shift = -d
      while (shift <= d) {
        val cp = start + shift
        // identical shifts can clamp to the same candidate only when the
        // generation also emits it; bounds mirror the rewrite's Filter
        if (cp >= 0 && cp + slen <= la) {
          if (a.substring(cp, cp + slen).equals(segStr)) {
            return ci == i && cp == pos
          }
        }
        shift += 1
      }
      ci += 1
    }
    false
  }
}

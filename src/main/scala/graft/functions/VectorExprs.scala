package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector expressions for the similarity/dedup hot paths.
  *
  * Why (SURVEY §7.1 preference order (b), same rationale as
  * [[NgramShingles]]): Catalyst evaluates higher-order-function lambdas
  * interpreted, per element. The round-1 formulations —
  * `aggregate(zip_with(a, b, ...))` per candidate pair (cosine/ANN,
  * measured ~15× slower than codegen) and a 32-bit nested
  * `aggregate(transform(sequence(0,31), ...))` vote (SimHash, where
  * CollapseProject additionally re-inlines the md5 hash column into every
  * bit lambda) — dominated the bench once projections were honestly
  * timed. Both expressions here are tight per-row loops with `doGenCode`,
  * fused into the surrounding WholeStageCodegen span: shuffle-free and
  * codegen'd.
  *
  * Determinism contract: each expression replays its HOF formulation's
  * exact arithmetic order, so results are bit-identical to round 1 and to
  * the DuckDB oracles (which keep the list_reduce formulations).
  */

/** `dot_product(a, b)`: sequential double dot-product of two equal-length
  * float/double array columns. Fold order is exactly
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`:
  * products accumulate left-to-right from 0.0, each operand cast to
  * DOUBLE first (float→double widening is exact). Mismatched lengths or
  * a null element yield NULL, mirroring zip_with's null padding poisoning
  * the fold. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType) = t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> args, " +
          s"got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, t: DataType, idx: String): String = t match {
        case FloatType => s"(double) $arr.getFloat($idx)"
        case _ => s"$arr.getDouble($idx)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ${get(a, elemType(left), i)} * ${get(b, elemType(right), i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val fnName = "dot_product"

  private val info = new ExpressionInfo(classOf[DotProduct].getName, fnName)

  private[graft] def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => DotProduct(a, b)
    case other => throw new IllegalArgumentException(
      s"$fnName expects (array, array); got ${other.size} args")
  }

  /** Register `dot_product` in this session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder _)
}

/** `simhash_bits(hs[, nBits])`: SimHash of a pre-hashed token array.
  * For each bit b in [0, nBits): every hash votes +1 if its bit b is set
  * else −1; the output sets bit b iff the vote sum is ≥ 0.
  *
  * Arithmetic replays the HOF formulation exactly —
  * `((h div 2^b) % 2) * 2 - 1` with div/% truncating toward zero (Java
  * semantics = Spark `div`/`%`), summed per bit; bit weights 2^b added
  * up — so results are bit-identical for any input sign. Null elements
  * poison the fold → NULL. */
case class SimHashBits(child: Expression, nBits: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      val pow = 1L << b
      var vote = 0L
      var j = 0
      while (j < n) {
        vote += ((hs.getLong(j) / pow) % 2L) * 2L - 1L
        j += 1
      }
      if (vote >= 0L) out += pow
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val pow = ctx.freshName("pow")
      val vote = ctx.freshName("vote")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  long $out = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    final long $pow = 1L << $b;
         |    long $vote = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $vote += (($c.getLong($j) / $pow) % 2L) * 2L - 1L;
         |    }
         |    if ($vote >= 0L) $out += $pow;
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  val fnName = "simhash_bits"

  private val info = new ExpressionInfo(classOf[SimHashBits].getName, fnName)

  private[graft] def builder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(hs) => SimHashBits(hs, 32)
    // any foldable integral works (1+1, CAST(16 AS BIGINT), …) — eval it
    // at build time; a non-foldable or non-integer second arg gets its
    // own message instead of the misleading arity error
    case Seq(hs, nb) if nb.foldable && (nb.dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }) =>
      nb.eval() match {
        case null => throw new IllegalArgumentException(
          s"$fnName nBits must not be NULL")
        case v: Number =>
          // bound-check the LONG value first — intValue() would silently
          // wrap 2^32+32 to 32 and compute the wrong hash width
          val n = v.longValue()
          if (n < 1L || n > 63L) throw new IllegalArgumentException(
            s"$fnName nBits must be in [1,63], got $n")
          SimHashBits(hs, n.toInt)
      }
    case Seq(_, nb) => throw new IllegalArgumentException(
      s"$fnName nBits must be a foldable integer expression; got ${nb.sql}")
    case other => throw new IllegalArgumentException(
      s"$fnName expects (array<bigint>[, nBits]); got ${other.size} args")
  }

  /** Register `simhash_bits` in this session's function registry. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(fnName), info, builder _)
}

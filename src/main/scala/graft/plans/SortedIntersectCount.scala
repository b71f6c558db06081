package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.sql.SparkSession

/** `sorted_intersect_count(a, b)` — intersection size of two SORTED,
  * DISTINCT arrays (both `array<string>` or both `array<bigint>`) via a
  * linear merge, with whole-stage codegen.
  *
  * Why a native Expression (SURVEY.md §2.10 decision revisited): the
  * brute-force Jaccard verifier compares O(n²) document pairs; built-in
  * `array_intersect` builds a hash set and materializes an output array
  * PER PAIR — pure allocation overhead when only the count is needed.
  * The long variant is the hot path: `getLong` on UnsafeArrayData is a
  * zero-allocation word read (the string variant still allocates a
  * UTF8String wrapper per element), so pre-hashing shingles with
  * xxhash64 makes the per-pair merge branch-and-compare only.
  * Jaccard over distinct sets follows as c / (|a| + |b| - c).
  *
  * Inputs MUST be sorted ascending and duplicate-free
  * (`array_sort(array_distinct(...))`) — unsorted input silently
  * undercounts, mirroring the contract of merge joins.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => StringType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) => true
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> or two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    if (elemType == LongType) {
      while (i < nx && j < ny) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < nx && j < ny) {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val body = if (elemType == LongType) {
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
           |  if ($xv == $yv) { $c++; $i++; $j++; }
           |  else if ($xv < $yv) $i++;
           |  else $j++;
         """.stripMargin
      } else {
        val cmp = ctx.freshName("cmp")
        s"""
           |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
           |  if ($cmp == 0) { $c++; $i++; $j++; }
           |  else if ($cmp < 0) $i++;
           |  else $j++;
         """.stripMargin
      }
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |$body
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `vector_dot(a, b)` — dot product of two `array<double>` via a direct
  * indexed loop with codegen. Replaces `aggregate(zip_with(a,b,*),…)`,
  * which materializes a zipped array per call — pure allocation in the
  * O(n²) similarity joins and the top-k scan.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var acc = 0.0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `graft_might_contain(bloom, longValue)` — bloom membership probe with
  * whole-stage codegen. Spark's own `BloomFilterMightContain` generates
  * `mightContainLong((Long)<literal>)` when the probe value constant-
  * folds; with a NEGATIVE literal Janino parses that as `Long` minus the
  * literal ("Expression java.lang.Long is not an rvalue") and the stage
  * silently drops to interpreted mode. This twin keeps Spark's null
  * semantics exactly (null/absent bloom → null, null value → null) and
  * emits a parenthesized primitive operand, so constant probes — the
  * shape `SqlSmoke` exercises — compile. The bloom side must be constant
  * per query (literal or scalar subquery, as in Spark's expression): it
  * deserializes ONCE per expression instance, never per row.
  */
case class GraftBloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.types.{BinaryType, BooleanType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType)
          if left.foldable ||
            left.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]] =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a CONSTANT bloom (literal or scalar subquery)")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint) arguments, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_might_contain"

  // Forced only at execution prep (eval/doGenCode), when a scalar
  // subquery's value is available — same lifecycle as Spark's impl.
  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    if (bloom == null) null
    else {
      val v = right.eval(input)
      if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (bloom == null)
      ev.copy(code = code"boolean ${ev.isNull} = true; boolean ${ev.value} = false;")
    else {
      val bf = ctx.addReferenceObj("graftBloom", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      val r = right.genCode(ctx)
      ev.copy(code =
        code"""
           |${r.code}
           |boolean ${ev.isNull} = ${r.isNull};
           |boolean ${ev.value} = false;
           |if (!${ev.isNull}) {
           |  ${ev.value} = $bf.mightContainLong((long)(${r.value}));
           |}
         """.stripMargin)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftBloomProbe =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))),
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))),
    (FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinhashMd5].getName, "minhash_md5"),
      (exprs: Seq[Expression]) => MinhashMd5(exprs(0))),
    (FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimhashMd5].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => SimhashMd5(exprs(0))),
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // internal runtime-filter rewrite but does not register them as SQL
    // functions; exposing them here gives the query surface a native
    // (codegen-friendly, UDF-free) bloom build + membership probe.
    // graft_bloom_agg(xxhash64(k), estimatedItems) -> binary;
    // graft_might_contain(bloomBinary, xxhash64(k)) -> boolean.
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1))),
    // Probe is our codegen-safe twin of Spark's BloomFilterMightContain
    // (identical null semantics) — Spark's generates a bare
    // `(Long)<negative literal>` cast for constant-folded probe values,
    // which Janino rejects and the stage then runs interpreted. See
    // GraftBloomProbe.
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[GraftBloomProbe].getName, "graft_might_contain"),
      (exprs: Seq[Expression]) => GraftBloomProbe(exprs(0), exprs(1))))

  /** Imperative registration (idempotent) for sessions built without the
    * extensions config.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    entries.foreach { case (id, _, builder) =>
      if (!reg.functionExists(id))
        reg.createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
  }
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` — the
  * spark-submit-native way to install the engine's functions cluster-wide.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.entries.foreach(e.injectFunction)
}

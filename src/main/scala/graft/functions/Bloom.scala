package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe as a native codegen'd expression.
  *
  * The 100 TB semi-join pattern: build a Bloom filter over the (small)
  * build side's join keys, ship it to every probe task, and drop probe
  * rows that cannot match BEFORE the shuffle — the exact join afterwards
  * removes the false positives, so results are bit-identical to the plain
  * join while the shuffle carries only ~selectivity + fpp of the probe
  * side. Spark's own runtime row-group filtering injects the same shape
  * (`BloomFilterAggregate`/`BloomFilterMightContain`) under AQE; this is
  * the explicit, user-directed form for when the optimizer cannot see the
  * opportunity (e.g. the build side is the result of an arbitrary
  * sub-pipeline).
  *
  * The filter rides along as a foldable binary literal child (serialized
  * `org.apache.spark.util.sketch.BloomFilter`), exactly how Spark's
  * injected runtime filters travel; deserialization happens once per
  * task via a plan reference object, never per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint key, foldable binary bloom), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = BooleanType

  // Deserialized once per plan instance; tasks receive it as a codegen
  // reference object (or through this lazy val on the interpreted path).
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(key: Any, ignored: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) => s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Broadcast-backed Bloom membership probe — the 100 TB form of
  * [[BloomMightContain]].
  *
  * The literal form embeds the serialized filter in the expression tree:
  * at 1 B build-side keys / 1 % fpp that is a ~1.2 GB byte array held on
  * the driver and shipped inside every stage's task binary. This form
  * carries only a [[org.apache.spark.broadcast.Broadcast]] HANDLE (a few
  * bytes) in the plan; the filter itself travels once per executor over
  * Spark's torrent broadcast and is fetched lazily on first probe —
  * exactly how Spark's own AQE-injected runtime filters
  * (`InSubqueryExec`/`BloomFilterMightContain`) move their payloads.
  *
  * Not SQL-registrable (a broadcast is not a literal); constructed via
  * [[GraftFunctions.bloomMightContain(key:org\.apache\.spark\.sql\.Column,bloom:org\.apache\.spark\.broadcast\.Broadcast[org\.apache\.spark\.util\.sketch\.BloomFilter])*]]
  * through the [[org.apache.spark.sql.graftshim.GraftSqlShim]] bridge.
  */
case class BloomMightContainBc(child: Expression, bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def prettyName: String = "graft_bloom_might_contain_bc"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType

  // Executor-side: Broadcast.value materializes the filter once per
  // executor (torrent-cached); the lazy val pins it per plan instance.
  @transient private lazy val bloom: BloomFilter = bloomBc.value

  override def nullSafeEval(key: Any): Any =
    bloom.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc, bcCls)
    // Cache the dereferenced filter in generated-class state so the hot
    // loop is a direct field access, not a Broadcast.value() call per row.
    val bloomVar = ctx.addMutableState(bfCls, "graftBloomVal")
    nullSafeCodeGen(ctx, ev, key =>
      s"""
         |if ($bloomVar == null) {
         |  $bloomVar = ($bfCls) $bcRef.value();
         |}
         |${ev.value} = $bloomVar.mightContainLong($key);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}

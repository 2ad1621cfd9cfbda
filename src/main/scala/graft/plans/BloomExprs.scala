package graft.plans

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd membership probe against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]]:
  * `bloom_might_contain(xxhash64(key))`.
  *
  * This is the map-side half of the bloom-prefilter pattern for joins
  * whose build side outgrows a broadcast HASH MAP but whose compact
  * SKETCH still broadcasts fine (a bloom at 1% fpp is ~1.2 bytes/item
  * vs ~50–100 bytes/entry for a hash relation): prefilter the huge
  * stream side down to (matches + fpp·n) rows BEFORE it pays the
  * shuffle for the exact join. False positives are possible — callers
  * MUST follow with an exact verify join; false negatives are not, so
  * the composition is exact. The filter ships to executors once via
  * the codegen reference array (the sketch is `Serializable`), and
  * deserializes lazily once per JVM on the interpreted path.
  *
  * The probe input is the caller's `xxhash64(key)` LONG — hashing is
  * left outside the expression so build and probe agree on the hash
  * by construction and the hash itself stays whole-stage-codegen'd.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a LONG hash input (xxhash64 the key), " +
        s"got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** One distributed pass (the stat-functions aggregate) over the
    * LongType column `hashCol`, serialized for [[probe]]. Sizing is
    * the standard `m = -n·ln(fpp)/ln²2` — overestimating
    * `expectedItems` only costs bits, never correctness. */
  def build(df: DataFrame, hashCol: String, expectedItems: Long,
            fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(hashCol, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  def probe(hash: Column, bloomBytes: Array[Byte]): Column =
    GraftShims.column(BloomMightContain(GraftShims.expression(hash), bloomBytes))
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{aggregate, array_min, lit, sequence, slice, transform, zip_with}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan 2005) point-frequency
  * kernels, static-callable from whole-stage codegen like
  * [[HashUtil]].
  *
  * Row hashes use Kirsch–Mitzenmacher double hashing
  * (`h_i = h1 + i*h2`) over a splitmix64-finalized key hash — two
  * derived 64-bit values per key, no per-row hash family materialized.
  * Everything is deterministic across JVMs and partitionings: the
  * sketch is a LINEAR summary (cell-wise sums), so unlike SpaceSaving
  * the entire sketch — not just its guaranteed set — is independent of
  * the merge tree.
  */
object CmsUtil {

  /** splitmix64 finalizer — full-avalanche 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashLong(v: Long): Long = mix64(v)
  def hashString(s: UTF8String): Long = mix64(HashUtil.fnv64(s))

  /** Add one occurrence of pre-hashed key `h` to `buf` (depth × width,
    * row-major).
    */
  def add(buf: Array[Long], h: Long, depth: Int, width: Int): Unit = {
    val h2 = mix64(h) | 1L
    var i = 0
    while (i < depth) {
      buf(i * width + java.lang.Math.floorMod(h + i * h2, width.toLong).toInt) += 1L
      i += 1
    }
  }

  /** Point estimate: min over the depth counters for pre-hashed key `h`. */
  def estimate(sketch: ArrayData, h: Long, depth: Int, width: Int): Long = {
    val h2 = mix64(h) | 1L
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = sketch.getLong(i * width + java.lang.Math.floorMod(h + i * h2, width.toLong).toInt)
      if (c < best) best = c
      i += 1
    }
    best
  }

  def estimateLong(sketch: ArrayData, key: Long, depth: Int, width: Int): Long =
    estimate(sketch, hashLong(key), depth, width)
  def estimateString(sketch: ArrayData, key: UTF8String, depth: Int, width: Int): Long =
    estimate(sketch, hashString(key), depth, width)
}

/** Count-Min sketch aggregate: `depth × width` cell-wise-summed Long
  * counters over LONG, INT or STRING keys, returned flattened row-major
  * as `array<bigint>`.
  *
  * Guarantees (Cormode & Muthukrishnan 2005), for every key x with true
  * count c(x) and N total rows:
  *  - `estimate(x) >= c(x)` — ALWAYS (counters only ever overcount);
  *  - `estimate(x) <= c(x) + (e/width)·N` with probability `1 − e^-depth`
  *    per key over the hash choice — fixed here (seeded by the key bytes
  *    alone), so for a given dataset the estimates are deterministic and
  *    the bound either holds or not, verifiable exactly (q131 pins it).
  *
  * Merge is cell-wise addition — a linear sketch — so partial
  * aggregation on any partitioning yields bit-identical sketches, and
  * sketches of disjoint corpora sum to the sketch of their union (the
  * 100 TB shape: one 64 KiB summary per shard, added associatively,
  * instead of a corpus-wide key shuffle).
  */
case class CmsSketchAgg(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "depth and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cmsSketch supports long, int and string keys, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case l: java.lang.Long => CmsUtil.hashLong(l.longValue())
        case i: java.lang.Integer => CmsUtil.hashLong(i.longValue())
        case s: UTF8String => CmsUtil.hashString(s)
        case other => throw new IllegalStateException(s"unreachable key $other")
      }
      CmsUtil.add(buf, h, depth, width)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** Point-frequency estimate from a flattened CMS — codegen scalar so the
  * probe side (typically a broadcast of the one-row sketch against a
  * keys frame) stays inside whole-stage codegen.
  */
case class CmsEstimate(left: Expression, right: Expression, depth: Int, width: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType | IntegerType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cmsEstimate(array<bigint>, long|int|string) got (${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData]
    key match {
      case l: java.lang.Long => CmsUtil.estimateLong(arr, l.longValue(), depth, width)
      case i: java.lang.Integer => CmsUtil.estimateLong(arr, i.longValue(), depth, width)
      case s: UTF8String => CmsUtil.estimateString(arr, s, depth, width)
      case other => throw new IllegalStateException(s"unreachable key $other")
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = right.dataType match {
      case StringType => "estimateString"
      case _ => "estimateLong"
    }
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.CmsUtil.$fn($s, $k, $depth, $width)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinSketch {

  /** CMS aggregate column: flattened `depth × width` `array<bigint>` over
    * a LONG, INT or STRING key column.
    */
  def cmsSketch(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Point-frequency estimate of `key` from a [[cmsSketch]] column built
    * with the same `depth`/`width`.
    */
  def cmsEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(key), depth, width))

  /** Join-size (inner-product) estimate from two [[cmsSketch]] columns
    * built with the same seeds/`depth`/`width` (Alon-Matias-Szegedy via
    * CM, Cormode & Muthukrishnan §4.2): per depth row, Σ_j A[i][j]·B[i][j]
    * overcounts |A ⋈ B| only through hash collisions, so min over rows
    * NEVER underestimates, and exceeds the truth by ≤ (e/width)·N_A·N_B
    * w.h.p. — the pre-flight join-cardinality check that costs two
    * constant-size sketch passes instead of the join. Pure array-column
    * arithmetic over the two flat depth×width buffers.
    */
  def cmsInnerProduct(a: Column, b: Column, depth: Int, width: Int): Column = {
    // DOUBLE products: two hot cells of ~4e9 each put x·y past 2^63 and
    // a BIGINT product would wrap negative — breaking the documented
    // never-underestimates bound. The estimate is approximate anyway;
    // double keeps 53-bit precision on a quantity only read to O(ε·N²).
    val prod = zip_with(a, b,
      (x, y) => x.cast("double") * y.cast("double"))
    array_min(transform(sequence(lit(0), lit(depth - 1)),
      i => aggregate(slice(prod, i * width + 1, lit(width)),
        lit(0.0), (acc, x) => acc + x)))
  }
}

package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k-by-hash (KMV) sketch as a custom `TypedImperativeAggregate` —
  * the catalyst-level custom AGGREGATE rung of the extension ladder
  * (scalar kernels and a physical operator cover the others).
  *
  * Keeps the k smallest hash values of the input (splitmix64-finalized
  * FNV — see the update() comment) with one retained example value per
  * hash. Unlike reservoir sampling it is fully
  * DETERMINISTIC under any partitioning/merge order (a min-k set is
  * associative+commutative), which makes it a reproducible uniform sample
  * AND a KMV distinct-count estimator (Bar-Yossef et al. 2002):
  * `est ≈ (k-1) / fraction(kth-smallest-hash)`.
  */
case class BottomKHashes(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Long, Array[Byte]]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("hash", LongType, nullable = false),
      StructField("value", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[Long, Array[Byte]] =
    new java.util.TreeMap[Long, Array[Byte]]()

  private def insert(buf: java.util.TreeMap[Long, Array[Byte]],
      h: Long, bytes: Array[Byte]): Unit = {
    if (!buf.containsKey(h)) {
      if (buf.size() < k) buf.put(h, bytes)
      else if (h < buf.lastKey()) { buf.remove(buf.lastKey()); buf.put(h, bytes) }
    }
  }

  override def update(buf: java.util.TreeMap[Long, Array[Byte]],
      input: InternalRow): java.util.TreeMap[Long, Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v match {
        case u: UTF8String => u
        // NON-string reference payloads render by identity (Array[Byte]
        // toString is "[B@…", catalyst containers likewise) — hashing
        // that is nondeterministic garbage, the exact failure this
        // class's determinism contract forbids. Reject them all; only
        // JVM value types (numbers/booleans from atomic columns) have
        // a stable toString.
        case _: Array[Byte] |
             _: org.apache.spark.sql.catalyst.util.ArrayData |
             _: org.apache.spark.sql.catalyst.util.MapData | _: InternalRow =>
          throw new IllegalArgumentException(
            s"graft_bottomk: unsupported input type ${child.dataType}; cast to string first")
        case other => UTF8String.fromString(other.toString)
      }
      // splitmix64-finalize the FNV hash: bottom-k-BY-VALUE reads the
      // hash's HIGH bits, and raw FNV-1a's high bits are visibly
      // non-uniform on short keys — measured: KMV union estimate 1112
      // on a true union of 4500 before finalization, 4482 after. Any
      // consumer replaying this sketch in SQL must apply the same
      // mix64 chain (see SparkEntry.mix64Chain).
      insert(buf, CmsUtil.mix64(HashUtil.fnv64(s)), s.getBytes.clone())
    }
    buf
  }

  override def merge(a: java.util.TreeMap[Long, Array[Byte]],
      b: java.util.TreeMap[Long, Array[Byte]]): java.util.TreeMap[Long, Array[Byte]] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(a, e.getKey, e.getValue)
    }
    a
  }

  override def eval(buf: java.util.TreeMap[Long, Array[Byte]]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey, UTF8String.fromBytes(e.getValue))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[Long, Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey)
      out.writeInt(e.getValue.length)
      out.write(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Long, Array[Byte]] = {
    val in = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = in.getInt
    var i = 0
    while (i < n) {
      val h = in.getLong
      val len = in.getInt
      val v = new Array[Byte](len)
      in.get(v)
      buf.put(h, v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BottomKHashes =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKHashes =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKHashes =
    copy(child = newChildren.head)
}

object BottomKSketch {

  /** Deterministic bottom-k sample column: array<struct<hash,value>>. */
  def bottomK(c: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKHashes(ColumnBridge.expression(c), k).toAggregateExpression())

  /** KMV distinct-count estimate from a collected sketch row. */
  def distinctEstimate(sketch: Seq[(Long, String)], k: Int): Double = {
    if (sketch.size < k) sketch.size.toDouble
    else {
      val kth = sketch.map(_._1).max
      // map signed long hash to a uniform fraction of [0,1)
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      (k - 1).toDouble / frac
    }
  }
}

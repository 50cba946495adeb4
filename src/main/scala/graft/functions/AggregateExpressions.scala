package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom aggregate kernels.
  *
  * [[CollectUpToLongs]] is the df-cap primitive of the inverted-index
  * pair kernel ([[graft.operators.Dedup]]): `collect_list` bounded at
  * `limit` elements. Unlike `slice(collect_list(..), 1, limit)` — which
  * still MATERIALIZES the full per-group list before slicing — the bound
  * holds throughout: every partial (map-side) buffer, every shuffled
  * serialized buffer, and every merged final buffer carries at most
  * `limit` longs, so a degenerate hot key (boilerplate n-gram present in
  * every document) costs O(limit) memory and O(map-partitions · limit)
  * shuffle bytes instead of a corpus-sized single-group array.
  *
  * Exactness contract for the df cap: with `limit = cap + 1`, a group's
  * result has size ≤ cap IFF the group's true cardinality is ≤ cap, and
  * in that case the list is COMPLETE (no truncation happened). Groups
  * that hit the limit are exactly the `df > cap` groups the old
  * hot-gram anti-join dropped — a size filter after the aggregate is
  * relationally identical. Which elements survive in an overflowing
  * buffer is order-dependent (like `collect_list` itself), but
  * overflowing groups are dropped by that filter, so every SURVIVING
  * list is the deterministic, complete posting set.
  */
object AggregateExpressions {

  /** `collect_list(child)` over non-null longs, keeping at most `limit`
    * elements per group (see object doc for the boundedness and
    * exactness contract). */
  case class CollectUpToLongs(
      child: Expression, limit: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CollectUpToLongs.Buffer] {
    require(limit >= 1, s"limit must be >= 1, got $limit")

    override def prettyName: String = "collect_up_to_longs"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def children: Seq[Expression] = child :: Nil

    override def createAggregationBuffer(): CollectUpToLongs.Buffer =
      new CollectUpToLongs.Buffer(new Array[Long](math.min(limit, 16)), 0)

    override def update(buf: CollectUpToLongs.Buffer,
                        input: InternalRow): CollectUpToLongs.Buffer = {
      if (buf.n < limit) {
        val v = child.eval(input)
        if (v != null) buf.append(v.asInstanceOf[Long], limit)
      }
      buf
    }

    override def merge(buf: CollectUpToLongs.Buffer,
                       other: CollectUpToLongs.Buffer): CollectUpToLongs.Buffer = {
      var i = 0
      while (buf.n < limit && i < other.n) {
        buf.append(other.a(i), limit)
        i += 1
      }
      buf
    }

    override def eval(buf: CollectUpToLongs.Buffer): Any =
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOf(buf.a, buf.n))

    override def serialize(buf: CollectUpToLongs.Buffer): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): CollectUpToLongs.Buffer = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = bb.getLong; i += 1 }
      new CollectUpToLongs.Buffer(a, n)
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CollectUpToLongs =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CollectUpToLongs =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  object CollectUpToLongs {
    /** Growable capped long buffer: `a(0 until n)` are the collected
      * values. Grows geometrically up to the cap so small groups (the
      * overwhelming majority under a df cap) never allocate cap-sized
      * arrays. */
    final class Buffer(var a: Array[Long], var n: Int) {
      def append(v: Long, limit: Int): Unit = {
        if (n == a.length) {
          a = java.util.Arrays.copyOf(a, math.min(limit, math.max(a.length * 2, 16)))
        }
        a(n) = v
        n += 1
      }
    }
  }

  /** Column-facing wrapper: bounded `collect_list` over a long column. */
  def collectUpToLongs(c: Column, limit: Int): Column =
    GraftBridge.column(
      CollectUpToLongs(GraftBridge.expr(c), limit).toAggregateExpression())
}

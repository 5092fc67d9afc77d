package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `k_core_agg(src, dst, k)` — the k-core of the UNDIRECTED simple view of
  * the group's edge rows, as ONE mergeable aggregate: the result is
  * `array<struct<node, degree>>` (in-core degrees, sorted by node id).
  *
  * The [[PairComponents]]/[[PageRankAgg]] argument applied to the peel
  * fixpoint: below a memory-measured edge budget the whole graph fits one
  * buffer, so the data-dependent peel cascade (round count = peel depth)
  * collapses from 2-jobs-per-round driver-synchronized rounds into one
  * aggregation. A map-side partial holds only ITS task's edge rows
  * (~16 bytes each); only the final merged buffer sees the graph. Past the
  * gate, the broadcast-anti-join peel loop in [[graft.ops.Graph.kCore]] is
  * the web-scale path.
  *
  * Semantics match the loop exactly because the k-core is UNIQUE: it is
  * the maximal subgraph with all degrees ≥ k, independent of peel order —
  * so the linear-time queue peel here and the loop's synchronous rounds
  * produce the identical node set, and in-core degrees are degrees of that
  * unique subgraph. The graph is made simple in here (self-loops dropped,
  * duplicate/bidirectional edges collapsed on the canonical (min, max)
  * key — `update` just appends, normalization happens once in eval),
  * matching the loop's `least/greatest + distinct`. Null endpoints
  * contribute nothing. An empty group yields an empty core (callers gate
  * on a positive edge count anyway, the [[PageRankAgg]] convention).
  */
case class KCoreAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PageRankAgg.EdgeBuf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"k_core_agg requires (bigint, bigint), got $other")
    }

  override def createAggregationBuffer(): PageRankAgg.EdgeBuf =
    new PageRankAgg.EdgeBuf()

  override def update(buffer: PageRankAgg.EdgeBuf, input: InternalRow): PageRankAgg.EdgeBuf = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null)
      buffer.add(a.asInstanceOf[Long], b.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: PageRankAgg.EdgeBuf, other: PageRankAgg.EdgeBuf): PageRankAgg.EdgeBuf = {
    buffer.addAll(other)
    buffer
  }

  override def eval(buffer: PageRankAgg.EdgeBuf): Any = KCoreAgg.run(buffer, k)

  override def serialize(buffer: PageRankAgg.EdgeBuf): Array[Byte] =
    buffer.serializeEdges()

  override def deserialize(bytes: Array[Byte]): PageRankAgg.EdgeBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new PageRankAgg.EdgeBuf()
    while (bb.remaining() >= 16) buf.add(bb.getLong(), bb.getLong())
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("node", LongType, nullable = false),
    StructField("degree", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "k_core_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): KCoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KCoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KCoreAgg =
    copy(left = newLeft, right = newRight)
}

object KCoreAgg {

  private[graft] def run(buffer: PageRankAgg.EdgeBuf, k: Int): GenericArrayData = {
    // id -> dense index, first-seen order (output re-sorts by id)
    val idx = mutable.LongMap.empty[Int]
    var ids = new Array[Long](1024)
    var nIds = 0
    def indexOf(id: Long): Int = idx.getOrElseUpdate(id, {
      if (nIds == ids.length) ids = java.util.Arrays.copyOf(ids, nIds * 2)
      ids(nIds) = id; nIds += 1; nIds - 1
    })
    // normalize to the UNDIRECTED simple graph: drop self-loops, collapse
    // duplicates and reversed copies on the canonical (min, max) key
    val seen = new PageRankAgg.LongSet(buffer.n)
    val eU = new Array[Int](buffer.n)
    val eV = new Array[Int](buffer.n)
    var m = 0
    var i = 0
    while (i < buffer.n) {
      val s = buffer.srcs(i); val d = buffer.dsts(i)
      if (s != d) {
        val ui = indexOf(math.min(s, d)); val vi = indexOf(math.max(s, d))
        val key = ui.toLong << 32 | (vi.toLong & 0xffffffffL)
        if (seen.add(key)) { eU(m) = ui; eV(m) = vi; m += 1 }
      }
      i += 1
    }
    val n = nIds
    // CSR adjacency over the simple undirected edges
    val deg = new Array[Int](n)
    i = 0
    while (i < m) { deg(eU(i)) += 1; deg(eV(i)) += 1; i += 1 }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](2 * m)
    val fill = java.util.Arrays.copyOf(off, n)
    i = 0
    while (i < m) {
      adj(fill(eU(i))) = eV(i); fill(eU(i)) += 1
      adj(fill(eV(i))) = eU(i); fill(eV(i)) += 1
      i += 1
    }
    // linear-time peel: push every node that falls below k once; the
    // k-core is unique, so queue order cannot change the result
    val live = new Array[Boolean](n)
    java.util.Arrays.fill(live, true)
    val cur = deg.clone()
    val stack = new Array[Int](n)
    var top = 0
    i = 0
    while (i < n) {
      if (cur(i) < k) { live(i) = false; stack(top) = i; top += 1 }
      i += 1
    }
    while (top > 0) {
      top -= 1
      val u = stack(top)
      var p = off(u)
      val end = off(u) + deg(u)
      while (p < end) {
        val v = adj(p)
        if (live(v)) {
          cur(v) -= 1
          if (cur(v) < k) { live(v) = false; stack(top) = v; top += 1 }
        }
        p += 1
      }
    }
    // emit surviving (node, in-core degree) sorted by node id
    var nOut = 0
    i = 0
    while (i < n) { if (live(i)) nOut += 1; i += 1 }
    val order = Array.range(0, n).filter(live).sortBy(ids(_))
    val out = new Array[Any](nOut)
    i = 0
    while (i < nOut) {
      val j = order(i)
      out(i) = InternalRow(ids(j), cur(j).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: the k-core of the group's (src, dst) edge rows, as
    * `array<struct<node, degree>>` sorted by node.
    */
  def kCoreAgg(src: Column, dst: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      KCoreAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(src),
        org.apache.spark.sql.graftbridge.Bridge.expression(dst),
        k).toAggregateExpression())
}

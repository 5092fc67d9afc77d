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

/** `hop_distance_agg(src, dst)` — bounded-horizon multi-source BFS of the
  * edge rows in the group, as ONE mergeable aggregate: the result is
  * `array<struct<node, hop>>` (reachable nodes only, sorted by node id).
  *
  * The [[PageRankAgg]] gate applied to BFS: below the caller's edge
  * budget, all `maxHops` frontier rounds run inside one aggregation
  * instead of `maxHops` driver-synchronized join rounds — BFS touches
  * each edge at most once, so the one-pass eval is strictly linear.
  * Semantics match [[graft.ops.Graph.hopDistance]] exactly: edges are
  * followed FORWARD, the graph is made simple (irrelevant to BFS beyond
  * self-loop removal, but kept identical), seeds outside the graph label
  * nothing, unreached nodes are absent.
  */
case class HopDistanceAgg(
    left: Expression,
    right: Expression,
    model: HopDistanceAgg.Model,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PageRankAgg.EdgeBuf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hop_distance_agg requires (bigint, bigint), got $other")
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

  override def eval(buffer: PageRankAgg.EdgeBuf): Any =
    HopDistanceAgg.run(buffer, model)

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
    StructField("hop", IntegerType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "hop_distance_agg"

  override def equals(other: Any): Boolean = other match {
    case HopDistanceAgg(l, r, m, mo, io) =>
      l == left && r == right && m.contentEquals(model) &&
        mo == mutableAggBufferOffset && io == inputAggBufferOffset
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * left.hashCode() + right.hashCode()) * 31) + model.contentHash

  override def withNewMutableAggBufferOffset(newOffset: Int): HopDistanceAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HopDistanceAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HopDistanceAgg =
    copy(left = newLeft, right = newRight)
}

object HopDistanceAgg {

  final class Model(val seeds: Array[Long], val maxHops: Int)
    extends Serializable {
    def contentEquals(o: Model): Boolean =
      maxHops == o.maxHops && java.util.Arrays.equals(seeds, o.seeds)
    def contentHash: Int =
      31 * maxHops + java.util.Arrays.hashCode(seeds)
  }

  private[graft] def run(buffer: PageRankAgg.EdgeBuf,
      model: Model): GenericArrayData = {
    // id -> dense index
    val idx = mutable.LongMap.empty[Int]
    var ids = new Array[Long](1024)
    var nIds = 0
    def indexOf(id: Long): Int = idx.getOrElseUpdate(id, {
      if (nIds == ids.length) ids = java.util.Arrays.copyOf(ids, nIds * 2)
      ids(nIds) = id; nIds += 1; nIds - 1
    })
    val seen = new PageRankAgg.LongSet(buffer.n)
    val eSrc = new Array[Int](buffer.n)
    val eDst = new Array[Int](buffer.n)
    var m = 0
    var i = 0
    while (i < buffer.n) {
      val s = buffer.srcs(i); val d = buffer.dsts(i)
      if (s != d) {
        val si = indexOf(s); val di = indexOf(d)
        val key = si.toLong << 32 | (di.toLong & 0xffffffffL)
        if (seen.add(key)) { eSrc(m) = si; eDst(m) = di; m += 1 }
      }
      i += 1
    }
    val n = nIds
    // forward CSR adjacency
    val offs = new Array[Int](n + 1)
    i = 0
    while (i < m) { offs(eSrc(i) + 1) += 1; i += 1 }
    i = 0
    while (i < n) { offs(i + 1) += offs(i); i += 1 }
    val adj = new Array[Int](m)
    val cur = offs.clone()
    i = 0
    while (i < m) { adj(cur(eSrc(i))) = eDst(i); cur(eSrc(i)) += 1; i += 1 }
    // multi-source BFS from the in-graph seeds
    val hop = new Array[Int](n)
    java.util.Arrays.fill(hop, -1)
    var frontier = new Array[Int](n)
    var fN = 0
    model.seeds.foreach { s =>
      idx.get(s).foreach { si =>
        if (hop(si) < 0) { hop(si) = 0; frontier(fN) = si; fN += 1 }
      }
    }
    var h = 0
    var labeled = fN
    while (h < model.maxHops && fN > 0) {
      h += 1
      val nextF = new Array[Int](n)
      var nN = 0
      var f = 0
      while (f < fN) {
        val v = frontier(f)
        var p = offs(v)
        val end = offs(v + 1)
        while (p < end) {
          val w = adj(p)
          if (hop(w) < 0) { hop(w) = h; nextF(nN) = w; nN += 1 }
          p += 1
        }
        f += 1
      }
      frontier = nextF; fN = nN; labeled += nN
    }
    // emit reached nodes sorted by id
    val reached = (0 until n).filter(hop(_) >= 0).toArray
    val order = reached.sortBy(ids(_))
    val out = new Array[Any](order.length)
    i = 0
    while (i < order.length) {
      out(i) = InternalRow(ids(order(i)), hop(order(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: bounded-horizon BFS of the (src, dst) edge rows in the
    * group from `seeds`, as `array<struct<node, hop>>` sorted by node.
    */
  def hopDistanceAgg(src: Column, dst: Column, seeds: Array[Long],
      maxHops: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      HopDistanceAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(src),
        org.apache.spark.sql.graftbridge.Bridge.expression(dst),
        new Model(seeds, maxHops))
        .toAggregateExpression())
}

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

/** `page_rank_agg(src, dst)` — damped PageRank (or personalized PageRank
  * when the model carries seeds) of the edge rows in the group, as ONE
  * mergeable aggregate: the result is `array<struct<node, r>>` sorted by
  * node id.
  *
  * The [[PairComponents]] argument applied to the numeric fixed-point:
  * below a memory-measured edge budget the whole iteration fits one
  * buffer, so ten Jacobi steps collapse from ten driver-synchronized
  * shuffle rounds into one aggregation — a map-side partial holds only
  * ITS task's edge rows (~16 bytes each), and only the final merged
  * buffer sees the graph (24 MB at 1.5M edges; the caller's
  * `edgeBufferLimit` gate makes that a measurement, not a guess — the
  * same philosophy as `broadcastNodeLimit`). This is exactly the shape a
  * single-node engine gives the problem, which is why the round-based
  * plan could never match it at gate scales; past the gate the
  * co-partitioned iteration loop in [[graft.ops.Graph.pageRank]] is the
  * web-scale path.
  *
  * Semantics match the iterative plan exactly: the graph is made SIMPLE
  * in here (self-loops dropped, duplicate edges collapsed — update just
  * appends, dedup happens once in eval), dangling mass leaks, seeds
  * outside the graph are ignored, and every float operation is the same
  * IEEE expression the relational plan evaluates (`r/od` division,
  * `(1-d)*w + d*sum` fold) — only contribution SUMMATION ORDER differs,
  * which the query contract already absorbs by rounding final ranks.
  * Null endpoints contribute nothing. An empty group fails loudly like
  * the loop's empty-graph require.
  */
case class PageRankAgg(
    left: Expression,
    right: Expression,
    model: PageRankAgg.Model,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PageRankAgg.EdgeBuf]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"page_rank_agg requires (bigint, bigint), got $other")
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
    PageRankAgg.run(buffer, model)

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
    StructField("r", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "page_rank_agg"

  // content equality over the model (CSE must not conflate two configs)
  override def equals(other: Any): Boolean = other match {
    case PageRankAgg(l, r, m, mo, io) =>
      l == left && r == right && m.contentEquals(model) &&
        mo == mutableAggBufferOffset && io == inputAggBufferOffset
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * left.hashCode() + right.hashCode()) * 31) + model.contentHash

  override def withNewMutableAggBufferOffset(newOffset: Int): PageRankAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PageRankAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PageRankAgg =
    copy(left = newLeft, right = newRight)
}

object PageRankAgg {

  /** Growable raw edge list — update/merge only append; the simple-graph
    * normalization happens once in eval.
    */
  final class EdgeBuf {
    var srcs: Array[Long] = new Array[Long](16)
    var dsts: Array[Long] = new Array[Long](16)
    var n: Int = 0
    def add(s: Long, d: Long): Unit = {
      if (n == srcs.length) {
        srcs = java.util.Arrays.copyOf(srcs, n * 2)
        dsts = java.util.Arrays.copyOf(dsts, n * 2)
      }
      srcs(n) = s; dsts(n) = d; n += 1
    }
    def addAll(o: EdgeBuf): Unit = {
      var i = 0
      while (i < o.n) { add(o.srcs(i), o.dsts(i)); i += 1 }
    }

    /** The shared 16-bytes-per-edge wire format of every edge-buffer
      * aggregate (PageRankAgg / WalkAgg / HopDistanceAgg / KCoreAgg).
      * The Int allocation arithmetic hard-caps a single serialized buffer
      * at ~134M edges — loudly, not by overflowing into a negative
      * allocation size or silently truncating on the deserialize side.
      * Callers' edge gates (default 8M) sit far under this ceiling; a
      * caller raising a gate past it must shard the aggregation instead.
      */
    def serializeEdges(): Array[Byte] = {
      require(n <= Int.MaxValue / 16,
        s"edge aggregation buffer of $n edges exceeds the ~134M-edge " +
          "serialization ceiling (16 B/edge in one Int-sized allocation); " +
          "lower the one-pass edge gate so the loop path handles this graph")
      val bb = ByteBuffer.allocate(n * 16)
      var i = 0
      while (i < n) { bb.putLong(srcs(i)); bb.putLong(dsts(i)); i += 1 }
      bb.array()
    }
  }

  /** Flat serializable config: PageRank when `seeds` is null,
    * personalized PageRank (teleport mass on the seed set) otherwise.
    * `initNodes`/`initRanks` (parallel arrays, or null) WARM-START the
    * iteration: r₀(v) = the prior rank where recorded, 1/n otherwise —
    * the incremental-maintenance face ([[graft.ops.Graph
    * .pageRankWarmStart]]); the fixpoint is unchanged, only the start.
    */
  final class Model(
      val iterations: Int,
      val damping: Double,
      val seeds: Array[Long],
      val initNodes: Array[Long] = null,
      val initRanks: Array[Double] = null) extends Serializable {
    def contentEquals(o: Model): Boolean =
      iterations == o.iterations && damping == o.damping &&
        java.util.Arrays.equals(seeds, o.seeds) &&
        java.util.Arrays.equals(initNodes, o.initNodes) &&
        java.util.Arrays.equals(initRanks, o.initRanks)
    def contentHash: Int =
      ((31 * iterations + java.lang.Double.hashCode(damping)) * 31 +
        java.util.Arrays.hashCode(seeds)) * 31 +
        java.util.Arrays.hashCode(initNodes)
  }

  /** Minimal primitive open-addressing long set (no boxing — an 8M-edge
    * dedup through java.util.HashSet would box ~400 MB).
    */
  private[functions] final class LongSet(expected: Int) {
    private var cap = Integer.highestOneBit(math.max(16, expected * 2) * 2 - 1) << 1
    private var mask = cap - 1
    private var table = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var size = 0
    def add(v: Long): Boolean = {
      if (size * 2 >= cap) grow()
      var slot = (java.lang.Long.hashCode(v * -7046029254386353131L)) & mask
      while (used(slot)) {
        if (table(slot) == v) return false
        slot = (slot + 1) & mask
      }
      used(slot) = true; table(slot) = v; size += 1
      true
    }
    private def grow(): Unit = {
      val ot = table; val ou = used
      cap *= 2; mask = cap - 1
      table = new Array[Long](cap); used = new Array[Boolean](cap)
      size = 0
      var i = 0
      while (i < ot.length) { if (ou(i)) add(ot(i)); i += 1 }
    }
  }

  private[graft] def run(buffer: EdgeBuf, model: Model): GenericArrayData = {
    // id -> dense index, first-seen order (output re-sorts by id)
    val idx = mutable.LongMap.empty[Int]
    var ids = new Array[Long](1024)
    var nIds = 0
    def indexOf(id: Long): Int = idx.getOrElseUpdate(id, {
      if (nIds == ids.length) ids = java.util.Arrays.copyOf(ids, nIds * 2)
      ids(nIds) = id; nIds += 1; nIds - 1
    })
    // normalize to the SIMPLE graph: drop self-loops, collapse duplicates
    val seen = new LongSet(buffer.n)
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
    require(n > 0, "pageRank: empty graph")
    val od = new Array[Double](n)
    i = 0
    while (i < m) { od(eSrc(i)) += 1.0; i += 1 }
    // teleport weights: uniform, or concentrated on the in-graph seeds
    val w = new Array[Double](n)
    if (model.seeds == null) {
      val u = 1.0 / n
      java.util.Arrays.fill(w, u)
    } else {
      var k = 0L
      val sset = new java.util.HashSet[Long]()
      model.seeds.foreach(s => sset.add(s))
      i = 0
      while (i < n) {
        if (sset.contains(ids(i))) k += 1
        i += 1
      }
      require(k > 0, "personalizedPageRank: no seed is a node of the graph")
      val u = 1.0 / k
      i = 0
      while (i < n) { if (sset.contains(ids(i))) w(i) = u; i += 1 }
    }
    var r =
      if (model.initNodes == null) w.clone()
      else {
        // warm start: prior ranks where recorded, uniform for new nodes —
        // the same r0 the loop path's left-join/coalesce produces
        val prior = mutable.LongMap.empty[Double]
        var p = 0
        while (p < model.initNodes.length) {
          prior.update(model.initNodes(p), model.initRanks(p)); p += 1
        }
        val r0 = new Array[Double](n)
        val u = 1.0 / n
        var q = 0
        while (q < n) { r0(q) = prior.getOrElse(ids(q), u); q += 1 }
        r0
      }
    val oneMinusD = 1.0 - model.damping
    // the base term replays the iterative plan's EXACT expressions:
    // (1-d)/n for PageRank (a single division), (1-d)*w for PPR
    val base: Array[Double] =
      if (model.seeds == null) Array.fill(n)(oneMinusD / n)
      else w.map(oneMinusD * _)
    var it = 0
    while (it < model.iterations) {
      val contrib = new Array[Double](n)
      i = 0
      while (i < m) {
        val s = eSrc(i)
        contrib(eDst(i)) += r(s) / od(s)
        i += 1
      }
      val next = new Array[Double](n)
      i = 0
      while (i < n) {
        next(i) = base(i) + model.damping * contrib(i)
        i += 1
      }
      r = next
      it += 1
    }
    // emit sorted by node id
    val order = Array.range(0, n).sortBy(ids(_))
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val j = order(i)
      out(i) = InternalRow(ids(j), r(j))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: PageRank of the (src, dst) edge rows in the group, as
    * `array<struct<node, r>>` sorted by node. `seeds = null` → standard
    * PageRank; otherwise teleport mass is split over the in-graph seeds.
    */
  def pageRankAgg(src: Column, dst: Column, iterations: Int,
      damping: Double, seeds: Array[Long]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PageRankAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(src),
        org.apache.spark.sql.graftbridge.Bridge.expression(dst),
        new Model(iterations, damping, seeds))
        .toAggregateExpression())

  /** Column API, warm-started: `init` are the (node, rank) pairs of a
    * prior vector — nodes absent there start at 1/n.
    */
  def pageRankAggWarm(src: Column, dst: Column, iterations: Int,
      damping: Double, init: Array[(Long, Double)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PageRankAgg(
        org.apache.spark.sql.graftbridge.Bridge.expression(src),
        org.apache.spark.sql.graftbridge.Bridge.expression(dst),
        new Model(iterations, damping, null,
          init.map(_._1), init.map(_._2)))
        .toAggregateExpression())
}

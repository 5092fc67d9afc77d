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

/** `pair_components(id_a, id_b)` — connected components of an edge list,
  * as ONE mergeable aggregate: each input row is an undirected edge, the
  * result is `array<struct<id, comp>>` with `comp` = the smallest id in
  * the component (sorted by id, so output is deterministic).
  *
  * Why it exists: transitive grouping normally needs iterative label
  * propagation — a driver-synced loop of joins ([[graft.pipeline.Dedup
  * .clusters]]), each round a full Spark job. That is the right shape when
  * ONE giant graph spans the corpus (text near-dup chains), but SemDeDup's
  * pair graph is the disjoint union of per-IVF-cell graphs, each bounded
  * by the cell size the operator already controls (k ≈ n/targetCellSize).
  * Grouping by cell and running union-find INSIDE the aggregate turns the
  * whole components step into one map-side-combinable aggregation — zero
  * driver-synced rounds, and at toy scale none of the per-round fixed job
  * costs that made the label-propagation path 7× the oracle.
  *
  * State is a union-by-min parent map over the ids seen so far — O(ids in
  * the group), i.e. cell-bounded, NOT corpus-bounded; partial states merge
  * by replaying the (id → root) entries as edges (connectivity is a
  * commutative/associative closure, so merge order cannot change the
  * result). Union-by-min keeps every tree's root equal to the component's
  * minimum id, so `comp` falls straight out of `find`.
  *
  * Null ids contribute nothing (a null endpoint is no edge). Inputs must
  * already be LongType — callers cast, the same contract as
  * [[graft.pipeline.Dedup.clusters]].
  */
case class PairComponents(
    left: Expression,
    right: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]]
  with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pair_components requires (bigint, bigint), got $other")
    }

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  /** Root of `id`'s tree with iterative path compression. */
  private def find(parent: mutable.LongMap[Long], id: Long): Long = {
    var root = id
    while (parent.getOrElse(root, root) != root) root = parent(root)
    // second pass: point the whole chain at the root
    var cur = id
    while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
    root
  }

  private def union(parent: mutable.LongMap[Long], a: Long, b: Long): Unit = {
    // register singletons so eval() emits isolated endpoints too
    if (!parent.contains(a)) parent(a) = a
    if (!parent.contains(b)) parent(b) = b
    val ra = find(parent, a)
    val rb = find(parent, b)
    if (ra < rb) parent(rb) = ra
    else if (rb < ra) parent(ra) = rb
  }

  override def update(buffer: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null) {
      union(buffer, a.asInstanceOf[Long], b.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: mutable.LongMap[Long], other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    other.foreach { case (id, p) => union(buffer, id, p) }
    buffer
  }

  override def eval(buffer: mutable.LongMap[Long]): Any = {
    val ids = buffer.keys.toArray
    java.util.Arrays.sort(ids)
    val out = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) {
      out(i) = InternalRow(ids(i), find(buffer, ids(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: mutable.LongMap[Long]): Array[Byte] = {
    // snapshot the keys before calling the path-compressing find(): find()
    // rewrites parent values in this same map, and mutating a LongMap while
    // foreach-ing it is only safe by an undocumented internal property
    val ids = buffer.keys.toArray
    // same ~134M-entry ceiling as EdgeBuf.serializeEdges: fail loudly
    // instead of overflowing the Int allocation arithmetic
    require(ids.length <= Int.MaxValue / 16,
      s"pair_components buffer of ${ids.length} nodes exceeds the ~134M-node " +
        "serialization ceiling (16 B/node in one Int-sized allocation); " +
        "lower unionFindNodeLimit so the loop path handles this graph")
    val bb = ByteBuffer.allocate(ids.length * 16)
    var i = 0
    while (i < ids.length) {
      bb.putLong(ids(i))
      bb.putLong(find(buffer, ids(i)))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buffer = mutable.LongMap.empty[Long]
    while (bb.remaining() >= 16) {
      val id = bb.getLong()
      val p  = bb.getLong()
      union(buffer, id, p)
    }
    buffer
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("comp", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean  = false
  override def prettyName: String = "pair_components"

  override def withNewMutableAggBufferOffset(newOffset: Int): PairComponents =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairComponents =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PairComponents =
    copy(left = newLeft, right = newRight)
}

object PairComponents {

  /** Column API: connected components of the (idA, idB) edge rows in the
    * group, as `array<struct<id, comp>>` with comp = min id per component.
    */
  def pairComponents(idA: Column, idB: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PairComponents(
        org.apache.spark.sql.graftbridge.Bridge.expression(idA),
        org.apache.spark.sql.graftbridge.Bridge.expression(idB))
        .toAggregateExpression())
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `nearest_cell(vec)` → `struct<cell_id: long, sim: double>`: the IVF
  * assignment argmax — highest ROUNDED cosine against the trained
  * centroids, ties to the smallest cell id — as ONE native expression with
  * the centroid table attached as a codegen reference object.
  *
  * Why it exists: the declarative formulation ([[graft.pipeline.Similarity
  * .ivfCellExpr]] pre-r8) built `array_max(array(struct(cosine(v, lit c₀)),
  * struct(cosine(v, lit c₁)), …))` — an expression tree LINEAR in the
  * centroid count, each candidate carrying its 64 literals. At the gate's
  * 16 cells that codegens fine; at the production cell counts the
  * n/targetCell lever implies (1.5k cells for a 200k corpus) the generated
  * method passes the JVM's 64 KB bytecode limit, Spark falls back to
  * interpreted evaluation, and the one narrow scan the operator is built
  * around becomes the bottleneck. Here the centroids are DATA (a broadcast
  * reference array, exactly like [[NearestCentroid]]), so generated code
  * size is constant in the cell count.
  *
  * Bit-parity contract with the declarative form it replaces (pinned by
  * `SimilaritySpec`): per-candidate similarity is the same left-to-right
  * [[CosineSim]] fold, rounded with the same Spark-Round-on-double
  * semantics (shortest-repr BigDecimal, HALF_UP, NaN/±Inf passthrough);
  * the argmax replicates the struct-max ordering INCLUDING its edge cases
  * — NaN sims compare greater than any number (Spark double ordering), a
  * vector that is null / has a null element yields null sims for EVERY
  * candidate and the tie-break then hands the smallest cell id with a
  * null `sim`, which is exactly what `array_max` over all-null-sim structs
  * produced. Length mismatches throw, like [[CosineSim]].
  */
case class NearestCell(child: Expression, cands: Array[(Long, Array[Double])])
  extends UnaryExpression {

  require(cands.nonEmpty, "nearest_cell requires at least one centroid")

  override def dataType: DataType = NearestCell.Shape
  override def nullable: Boolean  = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<float|double>, got $other")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // id-ascending order makes "strictly greater wins" equal to the
  // one flat, id-sorted table as the single reference object: contiguous
  // centroid doubles (cache-line friendly, no per-candidate array deref),
  // norms precomputed ONCE with the same left-to-right square fold as
  // CosineSim's nb accumulator (so sqrt sees the identical double) — the
  // declarative form re-folded them per row per candidate
  @transient private lazy val table: NearestCell.Table =
    NearestCell.Table.build(cands)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    NearestCell.nearest(
      if (v == null) null else v.asInstanceOf[ArrayData], table, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // NB: the Scala object-nested class mangles to NearestCell$Table in
    // Java source, which is what the generated code must name
    val tableRef = ctx.addReferenceObj("ncTable", table,
      "graft.functions.NearestCell$Table")
    val c = child.genCode(ctx)
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${c.code}
        InternalRow ${ev.value} = graft.functions.NearestCell.nearest(
          ${c.isNull} ? null : ${c.value}, $tableRef, $isFloat);
      """)
  }

  // content equality over the centroid table (CSE/semanticEquals must not
  // treat two different trained tables as interchangeable — same contract
  // as NearestCentroid / PQEncodeCodes)
  override def equals(other: Any): Boolean = other match {
    case NearestCell(c, b) =>
      c == child && b.length == cands.length &&
        b.zip(cands).forall { case ((i1, v1), (i2, v2)) =>
          i1 == i2 && java.util.Arrays.equals(v1, v2) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + cands.map { case (i, v) =>
      31 * i.hashCode() + java.util.Arrays.hashCode(v) }.toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {

  val Shape: StructType = StructType(Seq(
    StructField("cell_id", LongType, nullable = false),
    StructField("sim", DoubleType, nullable = true)))

  private def roundHalfUp6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Flat centroid table: `ids` sorted ascending, `flat` the row-major
    * centroid doubles (`d` per centroid), `norms(i)` the precomputed
    * norm. Serializable — shipped to executors as a codegen reference
    * object; the per-row raw-sim scratch buffer is a transient
    * thread-local (tasks are single-threaded), so the hot loop allocates
    * nothing.
    */
  final class Table(val ids: Array[Long], val flat: Array[Double],
      val norms: Array[Double], val d: Int) extends Serializable {
    def nCells: Int = ids.length
    @transient private lazy val scratchTL: ThreadLocal[Array[Double]] =
      ThreadLocal.withInitial(() => new Array[Double](ids.length))
    def scratch: Array[Double] = scratchTL.get()
  }

  object Table {
    def build(cands: Array[(Long, Array[Double])]): Table = {
      val sorted = cands.sortBy(_._1)
      val d = sorted.head._2.length
      require(sorted.forall(_._2.length == d),
        s"nearest_cell: centroids must share one dimension, got ${sorted.map(_._2.length).distinct.toSeq}")
      val flat  = new Array[Double](sorted.length * d)
      val norms = new Array[Double](sorted.length)
      var c = 0
      while (c < sorted.length) {
        val cv = sorted(c)._2
        System.arraycopy(cv, 0, flat, c * d, d)
        var sSq = 0.0; var i = 0
        while (i < d) { sSq += cv(i) * cv(i); i += 1 }
        norms(c) = math.sqrt(sSq)
        c += 1
      }
      new Table(sorted.map(_._1), flat, norms, d)
    }
  }

  /** Static kernel invoked from generated code. Never returns null — the
    * all-null-sim case (null vector or a null element) yields (smallest
    * id, null sim), mirroring the declarative struct-max.
    *
    * Rounding cost: the rounded argmax equals "round only the near-ties".
    * `roundHalfUp6` is monotone non-decreasing, so every candidate whose
    * ROUNDED sim equals the rounded raw max has raw sim ≥ rawMax − 1e-6
    * (the HALF_UP preimage of a rounded value is a 1e-6-wide interval
    * containing it). One pass tracks raw sims and rawMax; a second pass
    * rounds ONLY candidates inside that window and takes the smallest id
    * whose rounded sim matches — one-ish BigDecimal per ROW instead of
    * one per (row × centroid), which at 200k×1.5k assignments is the
    * difference between the rounding dominating and vanishing.
    */
  def nearest(v: ArrayData, t: Table, isFloat: Boolean): InternalRow = {
    if (v == null) return new GenericInternalRow(Array[Any](t.ids(0), null))
    val n = v.numElements()
    require(n == t.d, s"nearest_cell: length mismatch $n vs ${t.d}")
    // hoist the row once; bail to the null-sim contract on null elements
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return new GenericInternalRow(Array[Any](t.ids(0), null))
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var nx = 0.0
    i = 0
    while (i < n) { nx += x(i) * x(i); i += 1 }
    val sqnx = math.sqrt(nx)
    val nCells = t.nCells
    val flat   = t.flat
    val raw    = t.scratch
    var rawMax = Double.NegativeInfinity
    var sawNaN = false
    var c = 0
    var base = 0
    while (c < nCells) {
      var dot = 0.0
      i = 0
      while (i < n) { dot += x(i) * flat(base + i); i += 1 }
      // identical arithmetic shape to CosineSim: dot / (sqrt(na)*sqrt(nb))
      val s = dot / (sqnx * t.norms(c))
      raw(c) = s
      if (s.isNaN) sawNaN = true else if (s > rawMax) rawMax = s
      c += 1
      base += n
    }
    if (sawNaN) {
      // NaN compares greater than any number in Spark's double ordering:
      // the winner is the smallest id with a NaN sim
      c = 0
      while (c < nCells) {
        if (raw(c).isNaN) return new GenericInternalRow(
          Array[Any](t.ids(c), Double.NaN))
        c += 1
      }
    }
    val target = roundHalfUp6(rawMax)
    val lo = rawMax - 1e-6
    c = 0
    while (c < nCells) {
      if (raw(c) >= lo && roundHalfUp6(raw(c)) == target) {
        return new GenericInternalRow(Array[Any](t.ids(c), target))
      }
      c += 1
    }
    // unreachable: rawMax itself rounds to target
    new GenericInternalRow(Array[Any](t.ids(0), target))
  }

  def nearestCell(vec: Column, cands: Array[(Long, Array[Double])]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      NearestCell(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), cands))
}

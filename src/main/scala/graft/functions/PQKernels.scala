package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen kernels for the product-quantization hot path
  * ([[graft.pipeline.PQ]]).
  *
  * Why native: the declarative formulation (`transform`/`zip_with`/
  * `aggregate` over literal codebook arrays) is CORRECT but its lambdas are
  * interpreted per array element — measured ~0.65 ms/vector for encode at
  * the default 8×16×8 shape, which is fine for a demo corpus and
  * disqualifying for a billion-vector one. These expressions evaluate the
  * identical arithmetic (same fold order, same `round(d2, 6)` half-up
  * rounding, same smallest-id tie rule — the relational oracles keep
  * passing unchanged) as a tight primitive loop invoked from generated
  * code: no lambda dispatch, no boxing, no per-element null machinery.
  *
  * Float inputs are widened element-wise exactly like Spark's implicit
  * float→double arithmetic cast, so scores are bit-identical to the
  * declarative path on both `array<float>` and `array<double>` columns.
  */
object PQKernels {

  private def roundHalfUp6(d: Double): Double =
    // matches Spark's Round on DoubleType: BigDecimal.valueOf (i.e. the
    // Double.toString shortest-repr parse), setScale(6, HALF_UP); like
    // RoundBase, NaN/Infinity pass through unchanged (BigDecimal.valueOf
    // would throw NumberFormatException on them)
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Argmin code per subspace; null iff the vector is null/short/has null
    * elements in the used prefix.
    *
    * Malformed-input divergence (intentional, spec-pinned): the declarative
    * reference formulation yields `-1` codes for short/null-element vectors
    * (null per-centroid distances never beat the `Double.MaxValue`/`-1`
    * accumulator), while this kernel returns NULL for the whole code array —
    * a saner contract for downstream ADC, which would otherwise silently
    * score garbage against centroid `-1`. The "bit-exact ≡ declarative" pin
    * therefore holds for well-formed inputs; PQSpec pins both edge behaviors
    * explicitly.
    */
  def encode(vec: ArrayData, books: Array[Array[Array[Double]]],
      isFloat: Boolean): GenericArrayData = {
    val nSubq = books.length
    val dim   = books.map(_.head.length).sum
    if (vec.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val codes = new Array[Any](nSubq)
    var base  = 0
    var s     = 0
    while (s < nSubq) {
      val book = books(s)
      val dsub = book(0).length
      var bestD = Double.MaxValue
      var bestI = -1
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var j  = 0
        while (j < dsub) {
          val x = if (isFloat) vec.getFloat(base + j).toDouble
                  else vec.getDouble(base + j)
          val diff = x - cent(j)
          d2 += diff * diff
          j += 1
        }
        val rd = roundHalfUp6(d2)
        if (rd < bestD) { bestD = rd; bestI = c }
        c += 1
      }
      codes(s) = bestI
      base += dsub
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC inner product: Σ_s dot(query_sub_s, books(s)(codes(s))), summed in
    * subspace-major index order (the declarative fold's association).
    */
  def adcScore(qv: ArrayData, codes: ArrayData,
      books: Array[Array[Array[Double]]], isFloat: Boolean): Any = {
    val nSubq = books.length
    val dim   = books.map(_.head.length).sum
    if (qv.numElements() < dim || codes.numElements() < nSubq) return null
    var i = 0
    while (i < dim) { if (qv.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < nSubq) { if (codes.isNullAt(i)) return null; i += 1 }
    var total = 0.0
    var base  = 0
    var s     = 0
    while (s < nSubq) {
      val book = books(s)
      val dsub = book(0).length
      val code = codes.getInt(s)
      if (code < 0 || code >= book.length) return null
      val cent = book(code)
      var term = 0.0
      var j    = 0
      while (j < dsub) {
        val x = if (isFloat) qv.getFloat(base + j).toDouble
                else qv.getDouble(base + j)
        term += x * cent(j)
        j += 1
      }
      total += term
      base += dsub
      s += 1
    }
    total
  }

  /** Residual argmin codes: like [[encode]] but on `vec − centroids(cell)`
    * — the FAISS `IndexIVFPQ` residual-encoding layout, where each cell's
    * PQ codes quantize the (much smaller) displacement from the cell
    * centroid instead of the raw vector, so quantization resolution
    * concentrates where the data actually is. Same rounding + tie rules.
    */
  def residualEncode(vec: ArrayData, cell: Long,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]],
      isFloat: Boolean): GenericArrayData = {
    val nSubq = books.length
    val dim   = books.map(_.head.length).sum
    if (vec.numElements() < dim) return null
    if (cell < 0 || cell >= centroids.length) return null
    var i = 0
    while (i < dim) { if (vec.isNullAt(i)) return null; i += 1 }
    val cent0 = centroids(cell.toInt)
    if (cent0.length < dim) return null
    val codes = new Array[Any](nSubq)
    var base  = 0
    var s     = 0
    while (s < nSubq) {
      val book = books(s)
      val dsub = book(0).length
      var bestD = Double.MaxValue
      var bestI = -1
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var j  = 0
        while (j < dsub) {
          val x = if (isFloat) vec.getFloat(base + j).toDouble
                  else vec.getDouble(base + j)
          val diff = (x - cent0(base + j)) - cent(j)
          d2 += diff * diff
          j += 1
        }
        val rd = roundHalfUp6(d2)
        if (rd < bestD) { bestD = rd; bestI = c }
        c += 1
      }
      codes(s) = bestI
      base += dsub
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** Column API: PQ code array for a vector column. */
  def pqEncodeCodes(vec: Column, books: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PQEncodeCodes(org.apache.spark.sql.graftbridge.Bridge.expression(vec), books))

  /** Column API: residual PQ codes given the row's IVF cell id. */
  def pqResidualCodes(vec: Column, cellId: Column,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PQResidualCodes(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec),
        org.apache.spark.sql.graftbridge.Bridge.expression(cellId),
        centroids, books))

  /** Column API: ADC score of an exact query vector against a code array. */
  def pqAdcScore(qv: Column, codes: Column,
      books: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PQAdcScore(org.apache.spark.sql.graftbridge.Bridge.expression(qv),
        org.apache.spark.sql.graftbridge.Bridge.expression(codes), books))

  /** Static kernel for [[CellVector]]. */
  def cellVectorAt(cell: Long, cents: Array[Array[Double]]): GenericArrayData = {
    if (cell < 0 || cell >= cents.length) return null
    val row = cents(cell.toInt)
    val out = new Array[Any](row.length)
    var i = 0
    while (i < row.length) { out(i) = row(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: the centroid vector for a cell id — a reference-object
    * row lookup. The declarative twin `element_at(<nested array literal>,
    * cell + 1)` plants |cells|×dim literal NODES in the plan (~100k at the
    * production 1.5k-cell/64-dim shape), which Catalyst re-folds on every
    * analysis pass — measured as ~3-4 s of pure driver plan time per
    * search at crossover scale, 10× the actual query work.
    */
  def cellVector(cellId: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CellVector(org.apache.spark.sql.graftbridge.Bridge.expression(cellId),
        centroids))

  private[functions] def vecTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  private[functions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** `cell_vector(cell_id)` → `array<double>`: the IVF centroid row for a
  * cell id, carried as a reference object ([[PQKernels.cellVector]] for
  * why the literal-table twin is disqualifying). NULL for out-of-range
  * cells — matching `element_at`'s null on a missing index.
  */
case class CellVector(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cell_vector requires an integral cell id, got $other")
    }

  private lazy val cellIsInt = child.dataType == IntegerType

  override def nullSafeEval(cell: Any): Any = {
    val cellId = if (cellIsInt) cell.asInstanceOf[Int].toLong
                 else cell.asInstanceOf[Long]
    PQKernels.cellVectorAt(cellId, centroids)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cvCents", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PQKernels.cellVectorAt((long) $c, $centsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  // content equality over the reference array (see PQEncodeCodes)
  override def equals(other: Any): Boolean = other match {
    case CellVector(c, ce) =>
      c == child && java.util.Arrays.deepEquals(
        ce.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): CellVector =
    copy(child = newChild)
}

/** `pq_encode(vec)` → `array<int>` of per-subspace centroid codes. */
case class PQEncodeCodes(child: Expression, books: Array[Array[Array[Double]]])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // the kernel returns null for short/null-element vectors even when the
  // column itself is non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PQKernels.vecTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double>, got ${child.dataType}")

  private lazy val isFloat = PQKernels.isFloatArray(child.dataType)

  override def nullSafeEval(input: Any): Any =
    PQKernels.encode(input.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.PQKernels.encode($c, $booksRef, $isFloat);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  // case-class equality on Array fields is reference identity, which breaks
  // semanticEquals (and thus CSE / exchange reuse) for two expressions built
  // from equal codebooks — compare contents instead
  override def equals(other: Any): Boolean = other match {
    case PQEncodeCodes(c, b) =>
      c == child && java.util.Arrays.deepEquals(
        b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): PQEncodeCodes =
    copy(child = newChild)
}

/** `pq_residual_codes(vec, cell_id)` → `array<int>`: per-subspace codes of
  * the residual `vec − centroids(cell_id)` ([[PQKernels.residualEncode]]).
  * NULL for malformed vectors or out-of-range cell ids.
  */
case class PQResidualCodes(left: Expression, right: Expression,
    centroids: Array[Array[Double]], books: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PQKernels.vecTypeOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pq_residual_codes requires array<float|double> vector, got ${left.dataType}")
    else right.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_residual_codes requires an integral cell id, got $other")
    }

  private lazy val isFloat = PQKernels.isFloatArray(left.dataType)
  private lazy val cellIsInt = right.dataType == IntegerType

  override def nullSafeEval(vec: Any, cell: Any): Any = {
    val cellId = if (cellIsInt) cell.asInstanceOf[Int].toLong
                 else cell.asInstanceOf[Long]
    PQKernels.residualEncode(vec.asInstanceOf[ArrayData], cellId,
      centroids, books, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqrCents", centroids, "double[][]")
    val booksRef = ctx.addReferenceObj("pqrBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"""
         |${ev.value} = graft.functions.PQKernels.residualEncode($v, (long) $c,
         |  $centsRef, $booksRef, $isFloat);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  // content equality over both reference arrays (see PQEncodeCodes)
  override def equals(other: Any): Boolean = other match {
    case PQResidualCodes(l, r, ce, b) =>
      l == left && r == right &&
        java.util.Arrays.deepEquals(
          ce.asInstanceOf[Array[AnyRef]], centroids.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.deepEquals(
          b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PQResidualCodes =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc_score(query_vec, codes)` → double approximate inner product. */
case class PQAdcScore(left: Expression, right: Expression,
    books: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!PQKernels.vecTypeOk(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires array<float|double> query, got ${left.dataType}")
    else right.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires array<int> codes, got $other")
    }

  private lazy val isFloat = PQKernels.isFloatArray(left.dataType)

  override def nullSafeEval(qv: Any, codes: Any): Any =
    PQKernels.adcScore(qv.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      books, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val tmp = ctx.freshName("adc")
      s"""
         |Object $tmp = graft.functions.PQKernels.adcScore($q, $c, $booksRef, $isFloat);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $tmp).doubleValue(); }
       """.stripMargin
    })
  }

  // see PQEncodeCodes.equals: content equality over the codebook array so
  // equal-codebook expressions are semanticEquals
  override def equals(other: Any): Boolean = other match {
    case PQAdcScore(l, r, b) =>
      l == left && r == right && java.util.Arrays.deepEquals(
        b.asInstanceOf[Array[AnyRef]], books.asInstanceOf[Array[AnyRef]])
    case _ => false
  }

  override def hashCode(): Int =
    31 * (31 * left.hashCode() + right.hashCode()) +
      java.util.Arrays.deepHashCode(books.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PQAdcScore =
    copy(left = newLeft, right = newRight)
}

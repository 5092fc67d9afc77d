package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PQSpec extends SparkTestBase {

  import spark.implicits._

  // 2 subspaces of 2 dims each; 4 well-separated sample clusters so the
  // trained codebooks are predictable up to centroid numbering
  private def fixture = Seq(
    (0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
    (1L, Seq(0.1f, 0.0f, 10.0f, 10.1f)),
    (2L, Seq(5.0f, 5.0f, 0.0f, 0.0f)),
    (3L, Seq(5.1f, 5.0f, 0.0f, 0.1f)),
    (4L, Seq(0.0f, 0.1f, 0.1f, 0.0f)),
    (5L, Seq(5.0f, 5.1f, 10.1f, 10.0f))
  ).toDF("vec_id", "embedding")

  test("codebook shape, encode range, and argmin agreement with a Scala recompute") {
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding",
      nSubq = 2, nCentroids = 2, iters = 8)
    assert(books.length == 2 && books.forall(_.length == 2) &&
      books.forall(_.forall(_.length == 2)))

    val out = PQ.pqEncode(fixture, "embedding", books)
      .select($"vec_id", $"pq_codes").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList))

    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val vecs = fixture.orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).map(_.toDouble).toArray)
    val expected = vecs.zipWithIndex.map { case (v, id) =>
      (id.toLong, (0 until 2).map { s =>
        val sub = v.slice(s * 2, s * 2 + 2)
        // same rounded-argmin + smallest-id tie rule as the expression
        books(s).zipWithIndex
          .map { case (c, i) => (math.rint(d2(sub, c) * 1e6) / 1e6, i) }
          .minBy { case (d, i) => (d, i) }._2
      }.toList)
    }
    assert(out.toSeq == expected.toSeq)
    assert(out.forall(_._2.forall(c => c >= 0 && c < 2)))
  }

  test("lossless codebooks make ADC top-k identical to exact inner-product ranking") {
    // nCentroids >= distinct subvectors -> every subvector is its own
    // centroid, encoding is exact, so ADC == true inner product
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding",
      nSubq = 2, nCentroids = 6, iters = 12)
    val adc = PQ.pqTopK(fixture, fixture.filter($"vec_id" < 2),
        "vec_id", "embedding", k = 3, books)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    val exact = {
      val q = fixture.filter($"vec_id" < 2)
        .select($"vec_id".as("query_id"), $"embedding".as("__qv"))
      val c = fixture.select($"vec_id".as("neighbor_id"), $"embedding".as("__cv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
        .orderBy($"score".desc, $"neighbor_id".asc)
      c.crossJoin(broadcast(q))
        .filter($"query_id" =!= $"neighbor_id")
        .withColumn("score", round(graft.functions.VectorDot.vectorDot(
          $"__qv".cast("array<double>"), $"__cv".cast("array<double>")), 6))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"query_id", $"neighbor_id", $"score", $"rank".cast("long").as("rank"))
        .orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    }
    assert(adc.toSeq == exact.toSeq, s"adc ${adc.toSeq} vs exact ${exact.toSeq}")
  }

  test("coarse codebooks still rank the planted near-duplicate first") {
    // vec 1 is a near-copy of vec 0: even at 2 centroids/subspace the ADC
    // ranking must put it at rank 1 for query 0
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding",
      nSubq = 2, nCentroids = 2)
    val top = PQ.pqTopK(fixture, fixture.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 1, books).collect()
    assert(top.length == 1 && top(0).getLong(1) == 1L, top.mkString)
  }

  test("ivfPqTopK probing every cell with lossless codebooks == flat ADC top-k") {
    // the IVF layer must only PRUNE candidates: with nProbe = nCells no
    // cell is pruned, so the composed search must equal the flat scan
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding",
      nSubq = 2, nCentroids = 6, iters = 12)
    val cents = Similarity.ivfCentroids(fixture, "vec_id", "embedding", nCells = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val composed = rows(PQ.ivfPqTopK(fixture, fixture.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3, centroids = cents, nProbe = cents.length,
      codebooks = books))
    val flat = rows(PQ.pqTopK(fixture, fixture.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3, books))
    assert(composed == flat, s"composed $composed vs flat $flat")
  }

  test("ivfPqTopK nProbe=1 returns only rows from the query's nearest cell") {
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding",
      nSubq = 2, nCentroids = 2)
    val cents = Similarity.ivfCentroids(fixture, "vec_id", "embedding", nCells = 3)
    val cellOf = Similarity.ivfAssign(fixture, "embedding", cents)
      .select($"vec_id", $"cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nProbe=1 probe == argmax assignment (spec'd in SimilaritySpec), so the
    // query's probed cell IS its own assignment cell
    val out = PQ.ivfPqTopK(fixture, fixture, "vec_id", "embedding",
      k = 6, centroids = cents, nProbe = 1, codebooks = books).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(cellOf(n) == cellOf(q),
        s"neighbor $n (cell ${cellOf(n)}) outside query $q's cell ${cellOf(q)}")
    }
  }

  test("native kernels are bit-identical to the declarative formulation") {
    // the native codegen kernel (PQEncodeCodes / PQAdcScore) must agree
    // bit-for-bit with the pure-combinator reference on real float vectors
    assumeTestData("/root/testdata/sf0.001")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = PQ.pqCodebooks(e, "vec_id", "embedding", nSubq = 8)

    val both = e.select($"vec_id",
        PQ.pqEncodeExpr($"embedding", books).as("native"),
        PQ.pqEncodeExprDeclarative($"embedding", books).as("decl"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"encode mismatch: $r")
    }

    val coded = PQ.pqEncode(e, "embedding", books)
      .select($"vec_id", $"embedding", $"pq_codes").limit(200)
    val scores = coded.select(
        PQ.adcScoreExpr($"embedding", $"pq_codes", books).as("native"),
        PQ.adcScoreExprDeclarative($"embedding", $"pq_codes", books).as("decl"))
      .collect()
    scores.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"adc mismatch: $r")
    }
  }

  test("residual IVF-PQ: probe-all + lossless residual codebooks == exact ranking") {
    // every residual its own centroid -> reconstruction exact -> the
    // composed score IP(q, cent) + IP(q, residual) must reproduce the
    // flat exact inner-product ranking
    val cents = Similarity.ivfCentroids(fixture, "vec_id", "embedding", nCells = 2)
    val books = PQ.residualCodebooks(fixture, "vec_id", "embedding", cents,
      nSubq = 2, nCentroids = 6, iters = 12)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val composed = rows(PQ.ivfPqResidualTopK(fixture, fixture.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3, centroids = cents, nProbe = cents.length,
      codebooks = books))
    val exact = {
      val q = fixture.filter($"vec_id" < 2)
        .select($"vec_id".as("query_id"), $"embedding".as("__qv"))
      val c = fixture.select($"vec_id".as("neighbor_id"), $"embedding".as("__cv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
        .orderBy($"score".desc, $"neighbor_id".asc)
      c.crossJoin(broadcast(q))
        .filter($"query_id" =!= $"neighbor_id")
        .withColumn("score", round(graft.functions.VectorDot.vectorDot(
          $"__qv".cast("array<double>"), $"__cv".cast("array<double>")), 6))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"query_id", $"neighbor_id", $"score", $"rank".cast("long").as("rank"))
    }
    assert(composed == rows(exact), s"composed $composed")
  }

  test("residual codebooks cut ADC score error vs raw-vector codebooks") {
    // clustered corpus: residual quantization concentrates resolution on
    // the within-cell spread, so |IP_exact - IP_adc| must shrink at the
    // SAME codebook budget
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(4)(rnd.nextGaussian() * 10))
    val data = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(data, "vec_id", "embedding", nCells = 4)
    val rawBooks = PQ.pqCodebooks(data, "vec_id", "embedding",
      nSubq = 2, nCentroids = 4)
    val resBooks = PQ.residualCodebooks(data, "vec_id", "embedding", cents,
      nSubq = 2, nCentroids = 4)
    val queries = data.filter($"vec_id" < 10)
    def meanErr(scored: org.apache.spark.sql.DataFrame): Double = {
      val q = queries.select($"vec_id".as("query_id"), $"embedding".as("__ev"))
      scored.join(q, Seq("query_id"))
        .join(data.select($"vec_id".as("neighbor_id"), $"embedding".as("__nv")),
          Seq("neighbor_id"))
        .select(abs($"score" - graft.functions.VectorDot.vectorDot(
          $"__ev".cast("array<double>"), $"__nv".cast("array<double>"))).as("err"))
        .agg(avg($"err")).head.getDouble(0)
    }
    val rawErr = meanErr(PQ.pqTopK(data, queries, "vec_id", "embedding",
      k = 20, rawBooks))
    val resErr = meanErr(PQ.ivfPqResidualTopK(data, queries, "vec_id", "embedding",
      k = 20, centroids = cents, nProbe = cents.length, codebooks = resBooks))
    assert(resErr < rawErr,
      f"residual ADC error $resErr%.4f not below raw $rawErr%.4f")
  }

  test("NaN / Infinity elements don't crash the native kernel (Round-style passthrough)") {
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 2, nCentroids = 2)
    val weird = Seq(
      (20L, Seq(Float.NaN, 0.0f, 10.0f, 10.0f)),
      (21L, Seq(Float.PositiveInfinity, 0.0f, 0.0f, 0.0f)),
      (22L, Seq(0.0f, 0.0f, 10.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    // must not throw (BigDecimal.valueOf would NumberFormatException on
    // NaN/Inf); the clean row must still encode normally
    val out = PQ.pqEncode(weird, "embedding", books)
      .select($"vec_id", $"pq_codes").orderBy("vec_id").collect()
    assert(out.length == 3)
    val clean = out(2).getSeq[Int](1)
    assert(clean.forall(c => c >= 0 && c < 2))
    // NaN distances never beat the Double.MaxValue accumulator in the NaN
    // subspace; Infinity rounds through and loses to any finite distance —
    // either way the result is a well-formed code array, not a crash
    assert(!out(0).isNullAt(1) && !out(1).isNullAt(1))
  }

  test("malformed-vector divergence is pinned: native NULL vs declarative -1") {
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 2, nCentroids = 2)
    val short = Seq((30L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val both = short.select(
      PQ.pqEncodeExpr($"embedding", books).as("native"),
      PQ.pqEncodeExprDeclarative($"embedding", books).as("decl")).collect()(0)
    // documented intentional divergence (PQKernels.encode scaladoc): the
    // native kernel refuses short vectors with NULL; the declarative fold
    // encodes the complete subspace normally and degrades the incomplete
    // one to -1 (its zip_with null-pads, nulling every distance)
    assert(both.isNullAt(0))
    val decl = both.getSeq[Int](1)
    assert(decl.length == 2 && decl.head >= 0 && decl.last == -1, decl)
  }

  test("codebook artifact round-trips bit-exactly through parquet") {
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 2, nCentroids = 2)
    val dir = java.nio.file.Files.createTempDirectory("pq_artifact").toString
    try {
      PQ.saveCodebooks(spark, books, s"$dir/cb")
      val loaded = PQ.loadCodebooks(spark, s"$dir/cb")
      assert(loaded.length == books.length)
      books.zip(loaded).foreach { case (b, l) =>
        assert(b.length == l.length)
        b.zip(l).foreach { case (c1, c2) =>
          assert(c1.toSeq == c2.toSeq) // exact doubles, not approx
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("equal codebooks make encode expressions semanticEquals (CSE-able)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val books  = PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 2, nCentroids = 2)
    val books2 = books.map(_.map(_.clone()))
    val child  = Literal.create(Seq(1.0, 2.0, 3.0, 4.0), ArrayType(DoubleType))
    val e1 = graft.functions.PQEncodeCodes(child, books)
    val e2 = graft.functions.PQEncodeCodes(child, books2)
    // distinct array instances with equal contents must compare equal, or
    // common-subexpression elimination / exchange reuse can never fire
    assert(e1 == e2 && e1.hashCode() == e2.hashCode())
    val codes = Literal.create(Seq(0, 1), ArrayType(org.apache.spark.sql.types.IntegerType))
    val a1 = graft.functions.PQAdcScore(child, codes, books)
    val a2 = graft.functions.PQAdcScore(child, codes, books2)
    assert(a1 == a2 && a1.hashCode() == a2.hashCode())
  }

  test("null and dimension guards") {
    intercept[IllegalArgumentException] {
      PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 3)
    }
    val books = PQ.pqCodebooks(fixture, "vec_id", "embedding", nSubq = 2, nCentroids = 2)
    val withNull = fixture.union(Seq((9L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding"))
    val out = PQ.pqEncode(withNull, "embedding", books)
      .filter($"vec_id" === 9L).select($"pq_codes").collect()
    assert(out.length == 1 && out(0).isNullAt(0))
  }
}

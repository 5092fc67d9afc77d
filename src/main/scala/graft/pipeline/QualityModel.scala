package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass trained linear quality model — the "distill an expensive
  * signal into cheap features" pass a training-data pipeline runs so the
  * full corpus can be gated without paying the expensive scorer per doc
  * (the fastText-classifier / perplexity-proxy pattern, here with the
  * corpus unigram likelihood as the teacher signal).
  *
  * The model is ordinary least squares fit by the NORMAL EQUATIONS:
  * training is ONE aggregation over the feature frame computing the
  * 5×5 moment matrix `Σ x·xᵀ` and moment vector `Σ x·y` (15 + 5 + 1
  * scalars — map-side combined, nothing keyed, nothing sorted), then a
  * 5×5 Gaussian-elimination solve on the driver. That is the whole
  * training cost at any corpus size: one scan, one row collected.
  *
  * Cross-engine determinism: every feature is exact integer counts
  * through at most ONE IEEE division, and the teacher `y`
  * ([[TextAnalysis.scoreAgainstUnigramModel]]'s `mean_unigram_p`) is the
  * same — so an independent engine reproduces features and y
  * bit-for-bat from the raw table. The solved weights are rounded to
  * [[WeightScale]] decimals and become the artifact; scoring and the
  * normal-equation residual diagnostic both use the ROUNDED weights, so
  * any engine replaying `w·x` from the artifact gets bit-identical
  * scores. The residuals `Σ xⱼ·(y − ŷ)/n` are ~1e-6 with rounded
  * weights (exact zero in exact arithmetic — the OLS optimality
  * condition), so rounded to 3 decimals they pin the solve to 0.000
  * in-data: a wrong solve shows up as a non-zero residual on BOTH
  * engines.
  */
object QualityModel {

  val WeightScale = 9

  /** Feature names in solve order; `intercept` is the constant-1 column. */
  val FeatureNames: Seq[String] =
    Seq("intercept", "n_tokens", "ttr", "max_tf_ratio", "avg_token_len")

  /** The four features as ONE narrow projection over the scan — the
    * [[graft.functions.TokenStats]] kernel does the per-document word
    * census in a single byte pass, so there is no explode, no aggregate
    * and no exchange anywhere (which also makes scoring stateless per
    * row — the streaming face is the same code path). Empty documents
    * (no tokens) drop.
    */
  private def features(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.TokenStats.tokenStats(col(textCol)).as("__ts"),
        length(col(textCol)).cast("double").as("__len"))
      .filter(col("__ts.n_tokens") > 0)
      .select(col(idCol),
        col("__ts.n_tokens").cast("double").as("n_tokens"),
        (col("__ts.n_types").cast("double") / col("__ts.n_tokens")).as("ttr"),
        (col("__ts.max_tf").cast("double") / col("__ts.n_tokens")).as("max_tf_ratio"),
        (col("__len") / col("__ts.n_tokens")).as("avg_token_len"))

  /** Per-document feature frame `(id, x1..x4, y)`:
    *  - x1 `n_tokens`: token count;
    *  - x2 `ttr`: type/token ratio;
    *  - x3 `max_tf_ratio`: dominant-term share (repetition proxy);
    *  - x4 `avg_token_len`: text length / tokens;
    *  - y  `mean_unigram_p`: the corpus-unigram teacher signal.
    * Features are one kernel projection ([[features]]); only the teacher
    * signal pays a term join. Empty documents have no terms and drop
    * out of both sides. The unigram join is self-trained on `docs`, so
    * every term is in-vocabulary.
    */
  def featureFrame(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val y = TextAnalysis.scoreAgainstUnigramModel(docs, textCol, idCol,
        TextAnalysis.trainUnigramModel(docs, textCol, idCol))
      .select(col(idCol), col("mean_unigram_p").as("y"))
    features(docs, textCol, idCol).join(y, idCol)
  }

  /** Train OLS weights from a feature frame: one moment aggregation +
    * a driver-side 5×5 solve. Returns the weights in [[FeatureNames]]
    * order, rounded to [[WeightScale]] decimals (the artifact contract).
    */
  def train(feats: DataFrame): Array[Double] = {
    val xs: Seq[Column] = Seq(lit(1.0), col("n_tokens"), col("ttr"),
      col("max_tf_ratio"), col("avg_token_len"))
    val k = xs.length
    val momentCols =
      (for { i <- 0 until k; j <- i until k } yield
        sum(xs(i) * xs(j)).as(s"m_${i}_$j")) ++
      (0 until k).map(i => sum(xs(i) * col("y")).as(s"v_$i"))
    val row = feats.agg(momentCols.head, momentCols.tail: _*).head()
    // sums over zero rows are NULL — surface the empty-frame case with the
    // descriptive error rather than an NPE at getDouble
    require(!row.isNullAt(0),
      "QualityModel.train: empty feature frame — nothing to fit " +
        "(every document dropped out of the feature/teacher join?)")
    val m = Array.ofDim[Double](k, k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      m(i)(j) = row.getDouble(idx); m(j)(i) = m(i)(j); idx += 1
    }
    val v = Array.tabulate(k)(i => row.getDouble(idx + i))
    solve(m, v).map(w => graft.functions.Num.roundHalfUp(w, WeightScale))
  }

  /** Rank-revealing Gaussian elimination with partial pivoting
    * (deterministic: largest |value|, ties to the lowest row index).
    *
    * A COLLINEAR feature column — constant-length corpora make
    * `n_tokens` an exact multiple of the intercept, a real regime, not
    * an error — leaves only ~1e-16 cancellation junk as its pivot
    * (never an exact zero), detected against a RELATIVE floor and
    * assigned weight 0. The normal-equation residuals stay exactly zero
    * for dropped columns too: a dependent column is in the span of the
    * kept ones, so OLS orthogonality over the kept span covers it.
    * Fails loudly only when NOTHING is solvable (empty feature frame).
    */
  private def solve(m0: Array[Array[Double]], v0: Array[Double]): Array[Double] = {
    val k = v0.length
    val m = m0.map(_.clone)
    val v = v0.clone
    val scale = m.flatMap(_.map(math.abs)).max.max(java.lang.Double.MIN_NORMAL)
    val keep = scala.collection.mutable.ArrayBuffer[Int]()
    var r = 0
    for (c <- 0 until k) {
      var p = r
      for (q <- r + 1 until k) if (math.abs(m(q)(c)) > math.abs(m(p)(c))) p = q
      if (math.abs(m(p)(c)) > 1e-12 * scale) {
        if (p != r) { val t = m(p); m(p) = m(r); m(r) = t
          val tv = v(p); v(p) = v(r); v(r) = tv }
        for (q <- r + 1 until k) {
          val f = m(q)(c) / m(r)(c)
          for (j <- c until k) m(q)(j) -= f * m(r)(j)
          v(q) -= f * v(r)
        }
        keep += c
        r += 1
      }
    }
    require(keep.nonEmpty,
      "QualityModel.solve: zero-rank moment matrix (empty feature frame)")
    val w = new Array[Double](k)
    for (i <- keep.size - 1 to 0 by -1) {
      var s = v(i)
      for (j <- i + 1 until keep.size) s -= m(i)(keep(j)) * w(keep(j))
      w(keep(i)) = s / m(i)(keep(i))
    }
    w
  }

  /** `ŷ` as a column over a feature frame, from rounded artifact weights —
    * the literal left-to-right fold every engine reproduces bit-for-bit.
    */
  def predict(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("n_tokens") + lit(w(2)) * col("ttr") +
      lit(w(3)) * col("max_tf_ratio") + lit(w(4)) * col("avg_token_len")

  /** The trained-model report: (feature, weight, resid) — weights in
    * [[FeatureNames]] order plus the per-feature normal-equation
    * residual `Σ xⱼ·(y − ŷ)/n` (rounded to 3 decimals; 0.000 for a
    * correct solve) computed with the ROUNDED weights.
    */
  def trainReport(feats: DataFrame): DataFrame = {
    val f = Dedup.materializeOnce(feats)
    report(f, train(f))
  }

  /** The report for ALREADY-TRAINED weights (callers that cache the
    * artifact across queries pass it in; see [[trainReport]]).
    */
  def report(feats: DataFrame, w: Array[Double]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val err = col("y") - predict(w)
    val xs: Seq[Column] = Seq(lit(1.0), col("n_tokens"), col("ttr"),
      col("max_tf_ratio"), col("avg_token_len"))
    val row = feats.agg(count(lit(1)).as("n"),
      xs.zipWithIndex.map { case (x, i) => sum(x * err).as(s"r_$i") }: _*).head()
    val n = row.getLong(0).toDouble
    val out = FeatureNames.zipWithIndex.map { case (name, i) =>
      (name, w(i), graft.functions.Num.roundHalfUp(row.getDouble(i + 1) / n, 3))
    }
    out.toDF("feature", "weight", "resid")
  }

  /** Score documents against trained weights: ONE kernel scan + one
    * codegen projection — no explode, no aggregate, no exchange, no
    * join. Stateless per row, so the identical code path scores a
    * stream (the BM25-kernel convention).
    */
  def score(docs: DataFrame, textCol: String, idCol: String,
      w: Array[Double]): DataFrame = {
    require(w.length == FeatureNames.length,
      s"expected ${FeatureNames.length} weights, got ${w.length}")
    features(docs, textCol, idCol)
      .select(col(idCol), graft.functions.Num.round0(predict(w), 6).as("score"))
  }
}

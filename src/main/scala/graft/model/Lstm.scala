package graft.model

import breeze.linalg.{DenseMatrix, DenseVector}

/** LSTM autoencoder — the reference's model core
  * (`/root/reference/train_autoencoder.py:76-91`):
  *
  *   Input(L,F) → LSTM(64, relu, seq) → LSTM(32, relu, last)
  *   → RepeatVector(L) → LSTM(32, relu, seq) → LSTM(64, relu, seq)
  *   → TimeDistributed(Dense(F, sigmoid))
  *
  * Implemented from the public LSTM equations (Hochreiter & Schmidhuber
  * 1997; Keras gate order i,f,c,o with recurrent_activation = sigmoid and
  * activation = relu as configured). Pure Breeze — no native TF; weights are
  * plain matrices so they broadcast to executors for `mapPartitions`
  * inference (M3), which is the scale path: scoring is embarrassingly
  * parallel per window, zero shuffle.
  */
object Lstm {

  /** One LSTM layer's parameters. W: (inputDim, 4u), U: (u, 4u), b: (4u).
    * Gate column order matches Keras: [i | f | c | o]. */
  final case class LstmParams(w: DenseMatrix[Double], u: DenseMatrix[Double],
                              b: DenseVector[Double]) {
    def units: Int = u.rows
    def inputDim: Int = w.rows
  }

  /** Dense layer params: W (inputDim, out), b (out). */
  final case class DenseParams(w: DenseMatrix[Double], b: DenseVector[Double])

  /** Full autoencoder parameter set. */
  final case class AeParams(enc1: LstmParams, enc2: LstmParams,
                            dec1: LstmParams, dec2: LstmParams,
                            out: DenseParams) {
    def seqLen(l: Int): Int = l
    def numFeatures: Int = out.w.cols
  }

  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
  @inline private def relu(x: Double): Double = if (x > 0) x else 0.0

  /** Run one LSTM layer over a (L, inputDim) sequence; returns (L, units)
    * hidden states (caller takes the last row for return_sequences=False). */
  def runLayer(p: LstmParams, xs: DenseMatrix[Double]): DenseMatrix[Double] = {
    val l = xs.rows
    val u = p.units
    val hs = DenseMatrix.zeros[Double](l, u)
    var h = DenseVector.zeros[Double](u)
    var c = DenseVector.zeros[Double](u)
    var t = 0
    while (t < l) {
      val x = xs(t, ::).t
      val z = (p.w.t * x) + (p.u.t * h) + p.b // (4u)
      val i = DenseVector.tabulate(u)(j => sigmoid(z(j)))
      val f = DenseVector.tabulate(u)(j => sigmoid(z(u + j)))
      val g = DenseVector.tabulate(u)(j => relu(z(2 * u + j)))
      val o = DenseVector.tabulate(u)(j => sigmoid(z(3 * u + j)))
      c = (f *:* c) + (i *:* g)
      h = o *:* DenseVector.tabulate(u)(j => relu(c(j)))
      hs(t, ::) := h.t
      t += 1
    }
    hs
  }

  /** Full forward pass: (L, F) window → (L, F) reconstruction (M1/M4). */
  def forward(p: AeParams, window: DenseMatrix[Double]): DenseMatrix[Double] = {
    val l = window.rows
    val h1 = runLayer(p.enc1, window)            // (L, 64)
    val h2 = runLayer(p.enc2, h1)                // (L, 32)
    val code = h2(l - 1, ::).t                   // last state (32)
    val repeated = DenseMatrix.tabulate(l, code.length)((_, j) => code(j))
    val h3 = runLayer(p.dec1, repeated)          // (L, 32)
    val h4 = runLayer(p.dec2, h3)                // (L, 64)
    // TimeDistributed(Dense(F, sigmoid))
    DenseMatrix.tabulate(l, p.out.w.cols) { (t, j) =>
      sigmoid((h4(t, ::).t dot p.out.w(::, j)) + p.out.b(j))
    }
  }

  /** Reconstruction MSE of one window (A6 numerator for the model path). */
  def mse(x: DenseMatrix[Double], xhat: DenseMatrix[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < x.rows) {
      var j = 0
      while (j < x.cols) { val d = x(i, j) - xhat(i, j); s += d * d; j += 1 }
      i += 1
    }
    s / (x.rows * x.cols)
  }

  /** Per-feature MSE over the time axis (A8 model path). */
  def perFeatureMse(x: DenseMatrix[Double], xhat: DenseMatrix[Double]): Array[Double] =
    Array.tabulate(x.cols) { j =>
      var s = 0.0
      var i = 0
      while (i < x.rows) { val d = x(i, j) - xhat(i, j); s += d * d; i += 1 }
      s / x.rows
    }

  /** Deterministic Glorot-uniform init (seeded) — used for the frozen-weight
    * scoring slice and as training start. */
  def glorotInit(numFeatures: Int, units: Seq[Int] = Seq(64, 32, 32, 64),
                 seed: Long = 42L): AeParams = {
    val rng = new scala.util.Random(seed)
    def mat(rows: Int, cols: Int, fanIn: Int, fanOut: Int): DenseMatrix[Double] = {
      val limit = math.sqrt(6.0 / (fanIn + fanOut))
      DenseMatrix.tabulate(rows, cols)((_, _) => (rng.nextDouble() * 2 - 1) * limit)
    }
    def lstm(in: Int, u: Int): LstmParams = {
      val b = DenseVector.zeros[Double](4 * u)
      // Keras unit_forget_bias: forget gate bias starts at 1
      (u until 2 * u).foreach(b(_) = 1.0)
      LstmParams(mat(in, 4 * u, in, u), mat(u, 4 * u, u, u), b)
    }
    val Seq(u1, u2, u3, u4) = units
    AeParams(
      enc1 = lstm(numFeatures, u1),
      enc2 = lstm(u1, u2),
      dec1 = lstm(u2, u3),
      dec2 = lstm(u3, u4),
      out = DenseParams(mat(u4, numFeatures, u4, numFeatures),
        DenseVector.zeros[Double](numFeatures)))
  }

  // --- S9: weight persistence (JSON arrays instead of .keras) ---

  def save(p: AeParams, path: String): Unit =
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), toJson(p))

  def load(path: String): AeParams =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  def toJson(p: AeParams): String = {
    // column-major "data" (Breeze's native layout) — unambiguous round-trip
    def m(x: DenseMatrix[Double]): String =
      s"""{"rows":${x.rows},"cols":${x.cols},"data":[${x.toDenseMatrix.toArray.mkString(",")}]}"""
    def v(x: DenseVector[Double]): String = s"[${x.toArray.mkString(",")}]"
    def lp(l: LstmParams): String =
      s"""{"w":${m(l.w)},"u":${m(l.u)},"b":${v(l.b)}}"""
    s"""{"enc1":${lp(p.enc1)},"enc2":${lp(p.enc2)},"dec1":${lp(p.dec1)},""" +
      s""""dec2":${lp(p.dec2)},"out":{"w":${m(p.out.w)},"b":${v(p.out.b)}}}"""
  }

  def fromJson(txt: String): AeParams = {
    // Self-format parser (row-major "data" arrays; flat, regular structure).
    def section(key: String): String = {
      val i = txt.indexOf("\"" + key + "\":")
      require(i >= 0, s"missing $key")
      var depth = 0; var j = txt.indexOf('{', i)
      val start = j
      while ({ val ch = txt(j)
        if (ch == '{') depth += 1 else if (ch == '}') depth -= 1
        depth != 0 }) j += 1
      txt.substring(start, j + 1)
    }
    def nums(s: String): Array[Double] = {
      val b = s.indexOf('[') + 1; val e = s.indexOf(']', b)
      val body = s.substring(b, e).trim
      if (body.isEmpty) Array.empty else body.split(",").map(_.toDouble)
    }
    def mat(s: String): DenseMatrix[Double] = {
      val rows = s.substring(s.indexOf("\"rows\":") + 7).takeWhile(_.isDigit).toInt
      val cols = s.substring(s.indexOf("\"cols\":") + 7).takeWhile(_.isDigit).toInt
      val data = nums(s.substring(s.indexOf("\"data\":")))
      new DenseMatrix(rows, cols, data) // column-major, matches toJson
    }
    def vecAfter(s: String, key: String): DenseVector[Double] =
      DenseVector(nums(s.substring(s.indexOf("\"" + key + "\":"))))
    def lp(s: String): LstmParams =
      LstmParams(mat(section2(s, "w")), mat(section2(s, "u")), vecAfter(s, "b"))
    def section2(s: String, key: String): String = {
      val i = s.indexOf("\"" + key + "\":{")
      var depth = 0; var j = s.indexOf('{', i)
      val start = j
      while ({ val ch = s(j)
        if (ch == '{') depth += 1 else if (ch == '}') depth -= 1
        depth != 0 }) j += 1
      s.substring(start, j + 1)
    }
    val outS = section("out")
    AeParams(lp(section("enc1")), lp(section("enc2")),
      lp(section("dec1")), lp(section("dec2")),
      DenseParams(mat(section2(outS, "w")), vecAfter(outS, "b")))
  }
}

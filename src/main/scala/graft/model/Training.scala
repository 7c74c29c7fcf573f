package graft.model

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.model.Lstm._

/** M2: LSTM-autoencoder training — Adam + MSE + early stopping with
  * best-weight restore, matching the reference's training contract
  * (`/root/reference/train_autoencoder.py:196-237`: Adam lr 1e-3, loss MSE,
  * epochs ≤50, batch 64, shuffle, EarlyStopping(patience, restore best)).
  *
  * Backpropagation-through-time is implemented from the public LSTM
  * equations (gate order i,f,g,o; recurrent_activation sigmoid; activation
  * relu as configured). Two drivers:
  *  - [[trainDriver]]: minibatch Adam over driver-collected windows (the
  *    reference's scale: ~8k×20×19 doubles ≈ 25 MB — trivially driver-sized);
  *  - [[trainDistributed]]: the 100 TB path — per-epoch gradient via
  *    `RDD.treeAggregate` (map-side gradient partial sums, tree-combined),
  *    Adam step on the driver, broadcast back. The classic MLlib GLM shape.
  */
object Training {

  // ---- parameter flattening (Adam state lives on flat vectors) ----

  final case class Grads(enc1: LstmGrad, enc2: LstmGrad, dec1: LstmGrad,
                         dec2: LstmGrad, outW: DenseMatrix[Double],
                         outB: DenseVector[Double], loss: Double) {
    def +=(o: Grads): Grads = {
      enc1 += o.enc1; enc2 += o.enc2; dec1 += o.dec1; dec2 += o.dec2
      outW :+= o.outW; outB :+= o.outB
      Grads(enc1, enc2, dec1, dec2, outW, outB, loss + o.loss)
    }
    def scale(f: Double): Grads = {
      enc1.scale(f); enc2.scale(f); dec1.scale(f); dec2.scale(f)
      outW :*= f; outB :*= f
      Grads(enc1, enc2, dec1, dec2, outW, outB, loss)
    }
  }

  final case class LstmGrad(w: DenseMatrix[Double], u: DenseMatrix[Double],
                            b: DenseVector[Double]) {
    def +=(o: LstmGrad): LstmGrad = { w :+= o.w; u :+= o.u; b :+= o.b; this }
    def scale(f: Double): Unit = { w :*= f; u :*= f; b :*= f }
  }

  def zeroGrads(p: AeParams): Grads = {
    def z(l: LstmParams) = LstmGrad(
      DenseMatrix.zeros[Double](l.w.rows, l.w.cols),
      DenseMatrix.zeros[Double](l.u.rows, l.u.cols),
      DenseVector.zeros[Double](l.b.length))
    Grads(z(p.enc1), z(p.enc2), z(p.dec1), z(p.dec2),
      DenseMatrix.zeros[Double](p.out.w.rows, p.out.w.cols),
      DenseVector.zeros[Double](p.out.b.length), 0.0)
  }

  // ---- forward with caches ----

  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))
  @inline private def relu(x: Double): Double = if (x > 0) x else 0.0

  /** Per-layer forward keeping everything backward needs. */
  final class LayerCache(val xs: DenseMatrix[Double], p: LstmParams) {
    val l: Int = xs.rows
    val u: Int = p.units
    val i = DenseMatrix.zeros[Double](l, u)
    val f = DenseMatrix.zeros[Double](l, u)
    val g = DenseMatrix.zeros[Double](l, u)
    val o = DenseMatrix.zeros[Double](l, u)
    val c = DenseMatrix.zeros[Double](l, u)
    val h = DenseMatrix.zeros[Double](l, u)
    locally {
      var hPrev = DenseVector.zeros[Double](u)
      var cPrev = DenseVector.zeros[Double](u)
      var t = 0
      while (t < l) {
        val x = xs(t, ::).t
        val z = (p.w.t * x) + (p.u.t * hPrev) + p.b
        var j = 0
        while (j < u) {
          i(t, j) = sigmoid(z(j)); f(t, j) = sigmoid(z(u + j))
          g(t, j) = relu(z(2 * u + j)); o(t, j) = sigmoid(z(3 * u + j))
          c(t, j) = f(t, j) * cPrev(j) + i(t, j) * g(t, j)
          h(t, j) = o(t, j) * relu(c(t, j))
          j += 1
        }
        hPrev = h(t, ::).t; cPrev = c(t, ::).t
        t += 1
      }
    }
  }

  /** BPTT for one layer: given dH (grad wrt every h[t]), accumulate param
    * grads into `acc` and return dX (grad wrt the layer inputs). */
  def backwardLayer(p: LstmParams, cache: LayerCache,
                    dH: DenseMatrix[Double], acc: LstmGrad): DenseMatrix[Double] = {
    val l = cache.l; val u = cache.u
    val dX = DenseMatrix.zeros[Double](l, p.inputDim)
    var dhNext = DenseVector.zeros[Double](u)
    var dcNext = DenseVector.zeros[Double](u)
    var t = l - 1
    while (t >= 0) {
      val dh = dH(t, ::).t + dhNext
      val dz = DenseVector.zeros[Double](4 * u)
      val dc = DenseVector.zeros[Double](u)
      var j = 0
      while (j < u) {
        val cv = cache.c(t, j)
        val reluC = relu(cv)
        val dReluC = if (cv > 0) 1.0 else 0.0
        val ov = cache.o(t, j)
        // h = o * relu(c)
        val doo = dh(j) * reluC
        dc(j) = dcNext(j) + dh(j) * ov * dReluC
        val iv = cache.i(t, j); val fv = cache.f(t, j); val gv = cache.g(t, j)
        val cPrev = if (t == 0) 0.0 else cache.c(t - 1, j)
        dz(j) = dc(j) * gv * iv * (1 - iv)                       // d z_i
        dz(u + j) = dc(j) * cPrev * fv * (1 - fv)                // d z_f
        dz(2 * u + j) = dc(j) * iv * (if (gv > 0) 1.0 else 0.0)  // d z_g (relu)
        dz(3 * u + j) = doo * ov * (1 - ov)                      // d z_o
        dcNext(j) = dc(j) * fv
        j += 1
      }
      val x = cache.xs(t, ::).t
      val hPrev = if (t == 0) DenseVector.zeros[Double](u) else cache.h(t - 1, ::).t
      // z = W^T x + U^T hPrev + b  →  dW += x dzᵀ, dU += hPrev dzᵀ
      acc.w :+= x * dz.t
      acc.u :+= hPrev * dz.t
      acc.b :+= dz
      dX(t, ::) := (p.w * dz).t
      dhNext = p.u * dz
      t -= 1
    }
    dX
  }

  /** Full forward+backward for one window. Returns per-window loss with
    * gradients accumulated into `acc` (sum over windows; caller scales). */
  def forwardBackward(p: AeParams, x: DenseMatrix[Double], acc: Grads): Double = {
    val l = x.rows; val fDim = p.out.w.cols
    val c1 = new LayerCache(x, p.enc1)
    val c2 = new LayerCache(c1.h, p.enc2)
    val code = c2.h(l - 1, ::).t
    val repeated = DenseMatrix.tabulate(l, code.length)((_, j) => code(j))
    val c3 = new LayerCache(repeated, p.dec1)
    val c4 = new LayerCache(c3.h, p.dec2)

    // output layer + loss
    val y = DenseMatrix.zeros[Double](l, fDim)
    val dH4 = DenseMatrix.zeros[Double](l, c4.u)
    var loss = 0.0
    val dzOut = DenseMatrix.zeros[Double](l, fDim)
    var t = 0
    while (t < l) {
      var j = 0
      while (j < fDim) {
        val z = (c4.h(t, ::).t dot p.out.w(::, j)) + p.out.b(j)
        val yv = sigmoid(z)
        y(t, j) = yv
        val diff = yv - x(t, j)
        loss += diff * diff
        val dy = 2.0 * diff / (l * fDim)
        dzOut(t, j) = dy * yv * (1 - yv)
        j += 1
      }
      t += 1
    }
    loss /= (l * fDim)
    t = 0
    while (t < l) {
      acc.outW :+= c4.h(t, ::).t * dzOut(t, ::)
      acc.outB :+= dzOut(t, ::).t
      dH4(t, ::) := (p.out.w * dzOut(t, ::).t).t
      t += 1
    }

    val dH3 = backwardLayer(p.dec2, c4, dH4, acc.dec2)
    val dRepeated = backwardLayer(p.dec1, c3, dH3, acc.dec1)
    // RepeatVector: code feeds every timestep → sum the grads
    val dCode = DenseVector.zeros[Double](code.length)
    t = 0
    while (t < l) { dCode :+= dRepeated(t, ::).t; t += 1 }
    val dH2 = DenseMatrix.zeros[Double](l, c2.u)
    dH2(l - 1, ::) := dCode.t // enc2 returns last state only
    val dH1 = backwardLayer(p.enc2, c2, dH2, acc.enc2)
    backwardLayer(p.enc1, c1, dH1, acc.enc1)
    loss
  }

  // ---- Adam ----

  final class Adam(lr: Double = 1e-3, b1: Double = 0.9, b2: Double = 0.999,
                   eps: Double = 1e-7) { // Keras default epsilon
    private var t = 0
    private var m: Array[Double] = _
    private var v: Array[Double] = _
    def step(params: Array[Double], grads: Array[Double]): Unit = {
      if (m == null) { m = new Array(params.length); v = new Array(params.length) }
      t += 1
      val bc1 = 1 - math.pow(b1, t)
      val bc2 = 1 - math.pow(b2, t)
      var k = 0
      while (k < params.length) {
        m(k) = b1 * m(k) + (1 - b1) * grads(k)
        v(k) = b2 * v(k) + (1 - b2) * grads(k) * grads(k)
        params(k) -= lr * (m(k) / bc1) / (math.sqrt(v(k) / bc2) + eps)
        k += 1
      }
    }
  }

  /** Flatten/unflatten params so Adam state is a pair of arrays. */
  def flatten(p: AeParams): Array[Double] = {
    val parts = Seq(
      p.enc1.w.toArray, p.enc1.u.toArray, p.enc1.b.toArray,
      p.enc2.w.toArray, p.enc2.u.toArray, p.enc2.b.toArray,
      p.dec1.w.toArray, p.dec1.u.toArray, p.dec1.b.toArray,
      p.dec2.w.toArray, p.dec2.u.toArray, p.dec2.b.toArray,
      p.out.w.toArray, p.out.b.toArray)
    Array.concat(parts: _*)
  }

  def flattenGrads(g: Grads): Array[Double] = {
    val parts = Seq(
      g.enc1.w.toArray, g.enc1.u.toArray, g.enc1.b.toArray,
      g.enc2.w.toArray, g.enc2.u.toArray, g.enc2.b.toArray,
      g.dec1.w.toArray, g.dec1.u.toArray, g.dec1.b.toArray,
      g.dec2.w.toArray, g.dec2.u.toArray, g.dec2.b.toArray,
      g.outW.toArray, g.outB.toArray)
    Array.concat(parts: _*)
  }

  def unflatten(template: AeParams, flat: Array[Double]): AeParams = {
    var off = 0
    def mat(rows: Int, cols: Int): DenseMatrix[Double] = {
      val m = new DenseMatrix(rows, cols, java.util.Arrays.copyOfRange(flat, off, off + rows * cols))
      off += rows * cols; m
    }
    def vec(n: Int): DenseVector[Double] = {
      val v = DenseVector(java.util.Arrays.copyOfRange(flat, off, off + n)); off += n; v
    }
    def lstm(l: LstmParams): LstmParams =
      LstmParams(mat(l.w.rows, l.w.cols), mat(l.u.rows, l.u.cols), vec(l.b.length))
    AeParams(lstm(template.enc1), lstm(template.enc2), lstm(template.dec1),
      lstm(template.dec2),
      DenseParams(mat(template.out.w.rows, template.out.w.cols),
        vec(template.out.b.length)))
  }

  // ---- training drivers ----

  final case class TrainResult(params: AeParams, history: Seq[(Double, Double)],
                               bestEpoch: Int)

  /** Minibatch Adam on driver-local windows with early stopping + best
    * restore (train_autoencoder.py:196-237 semantics). */
  def trainDriver(trainX: IndexedSeq[DenseMatrix[Double]],
                  valX: IndexedSeq[DenseMatrix[Double]],
                  init: AeParams, epochs: Int = 50, batchSize: Int = 64,
                  lr: Double = 1e-3, patience: Int = 10,
                  seed: Long = 42L): TrainResult = {
    var flat = flatten(init)
    val adam = new Adam(lr = lr)
    val rng = new scala.util.Random(seed)
    var best = flat.clone(); var bestVal = Double.MaxValue; var bestEpoch = -1
    var wait = 0
    val history = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var epoch = 0
    while (epoch < epochs && wait <= patience) {
      val order = rng.shuffle(trainX.indices.toVector)
      var trainLoss = 0.0
      order.grouped(batchSize).foreach { batch =>
        val p = unflatten(init, flat)
        val acc = zeroGrads(p)
        var bl = 0.0
        batch.foreach(idx => bl += forwardBackward(p, trainX(idx), acc))
        trainLoss += bl
        adam.step(flat, flattenGrads(acc.scale(1.0 / batch.size)))
      }
      trainLoss /= math.max(1, trainX.size)
      val valLoss =
        if (valX.isEmpty) trainLoss
        else {
          val p = unflatten(init, flat)
          valX.map(x => Lstm.mse(x, Lstm.forward(p, x))).sum / valX.size
        }
      history += ((trainLoss, valLoss))
      if (valLoss < bestVal) { bestVal = valLoss; best = flat.clone(); bestEpoch = epoch; wait = 0 }
      else wait += 1
      epoch += 1
    }
    TrainResult(unflatten(init, best), history.toSeq, bestEpoch)
  }

  /** Distributed MINIBATCH Adam — the scale path with the reference's
    * optimization schedule (`train_autoencoder.py:199`: batch 64, shuffled
    * each epoch, one Adam step per batch), not one step per epoch.
    *
    * Shape per epoch: ONE narrow hash pass assigns every window to a seeded
    * pseudo-random slice `murmur3(id, epoch, seed) mod numBatches` (the
    * distributed analogue of the driver path's per-epoch shuffle), one
    * shuffle regroups slices into `numBatches × tasksPerBatch` partitions,
    * then each batch is one Spark job over its own `tasksPerBatch`
    * partitions: executors compute gradient partial sums over broadcast
    * weights, the driver combines O(model)-sized partials and takes the
    * Adam step — classic synchronous data-parallel SGD. Per-step traffic is
    * O(model) (a few MB) regardless of window count; the shuffle map output
    * is computed once per epoch and reused by every batch job (Spark stage
    * reuse), so total data movement per epoch is one pass. At cluster scale
    * the knobs are `batchSize` (larger batches amortize the per-step
    * broadcast/allreduce barrier) and `tasksPerBatch` (parallelism within a
    * step); windows never touch the driver in any configuration.
    *
    * When `valWindows` is given, early stopping and best-weight restore key
    * on the held-out loss (a forward-only treeAggregate per epoch — shuffle
    * volume one Double per partition), matching the driver path's
    * EarlyStopping(val_loss) semantics; otherwise they fall back to the
    * training loss. Reported train loss mirrors Keras/trainDriver: the sum
    * of per-window losses as each batch was visited, over n. */
  def trainDistributed(spark: org.apache.spark.sql.SparkSession,
                       windows: org.apache.spark.rdd.RDD[DenseMatrix[Double]],
                       init: AeParams, epochs: Int = 50, lr: Double = 1e-3,
                       patience: Int = 10,
                       valWindows: Option[org.apache.spark.rdd.RDD[DenseMatrix[Double]]] = None,
                       batchSize: Int = 64, seed: Long = 42L,
                       tasksPerBatch: Int = 0): TrainResult = {
    val sc = spark.sparkContext
    var flat = flatten(init)
    val adam = new Adam(lr = lr)
    val indexed = windows.zipWithIndex().map(_.swap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = indexed.count().toDouble
    val nVal = valWindows.map(_.count().toDouble).getOrElse(0.0)
    val numBatches = math.max(1, math.ceil(n / batchSize).toInt)
    // default intra-step parallelism: spread the input's partitions over the
    // batches (>=1) so one epoch occupies about as many tasks as the input had
    val tpb = if (tasksPerBatch > 0) tasksPerBatch
      else math.max(1, math.ceil(windows.getNumPartitions.toDouble / numBatches).toInt)
    val numSlices = numBatches * tpb
    var best = flat.clone(); var bestVal = Double.MaxValue; var bestEpoch = -1
    var wait = 0
    val history = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    var epoch = 0
    while (epoch < epochs && wait <= patience) {
      val e = epoch
      // seeded per-epoch re-slicing; HashPartitioner on an Int key in
      // [0, numSlices) is the identity partitioner
      val sliced = indexed.map { case (id, x) =>
        (math.floorMod(scala.util.hashing.MurmurHash3.productHash((id, e, seed)),
          numSlices), x)
      }.partitionBy(new org.apache.spark.HashPartitioner(numSlices)).values
      var epochLossSum = 0.0
      var b = 0
      while (b < numBatches) {
        val bc = sc.broadcast(unflatten(init, flat))
        val results = sc.runJob(sliced,
          (it: Iterator[DenseMatrix[Double]]) => {
            val p = bc.value
            val acc = zeroGrads(p)
            var loss = 0.0; var cnt = 0L
            it.foreach { x => loss += forwardBackward(p, x, acc); cnt += 1 }
            (flattenGrads(acc), loss, cnt)
          }, b * tpb until (b + 1) * tpb)
        bc.destroy()
        val cnt = results.map(_._3).sum.toDouble
        if (cnt > 0) { // a slice can hash empty on tiny inputs
          val g = results.map(_._1).reduceLeft { (g1, g2) =>
            var k = 0; while (k < g1.length) { g1(k) += g2(k); k += 1 }; g1
          }
          var k = 0; while (k < g.length) { g(k) /= cnt; k += 1 }
          adam.step(flat, g)
          epochLossSum += results.map(_._2).sum
        }
        b += 1
      }
      val loss = epochLossSum / n
      // held-out loss evaluated with the post-epoch params, as Keras
      // reports val_loss after the epoch
      val valLoss = valWindows match {
        case Some(va) if nVal > 0 =>
          val bcNew = sc.broadcast(unflatten(init, flat))
          val s = va.treeAggregate(0.0)(
            (l, x) => l + Lstm.mse(x, Lstm.forward(bcNew.value, x)),
            _ + _, depth = 2)
          bcNew.destroy()
          s / nVal
        case _ => loss
      }
      history += ((loss, valLoss))
      if (valLoss < bestVal) { bestVal = valLoss; best = flat.clone(); bestEpoch = epoch; wait = 0 }
      else wait += 1
      epoch += 1
    }
    indexed.unpersist(false)
    TrainResult(unflatten(init, best), history.toSeq, bestEpoch)
  }
}

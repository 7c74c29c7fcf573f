package graft.model

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

class LstmSpec extends AnyFunSuite {

  private val F = 3
  private val params = Lstm.glorotInit(F, units = Seq(8, 4, 4, 8), seed = 7L)
  private def window(l: Int): DenseMatrix[Double] =
    DenseMatrix.tabulate(l, F)((i, j) => math.sin(i * 0.5 + j) * 0.4 + 0.5)

  test("forward: reconstruction has input shape; sigmoid output in (0,1) (M1)") {
    val x = window(20)
    val xhat = Lstm.forward(params, x)
    assert(xhat.rows == 20 && xhat.cols == F)
    assert(xhat.toArray.forall(v => v > 0.0 && v < 1.0))
  }

  test("forward is deterministic for fixed weights (M4)") {
    val x = window(20)
    val a = Lstm.forward(params, x)
    val b = Lstm.forward(params, x)
    assert(a == b)
  }

  test("glorotInit is seed-deterministic and honors unit_forget_bias") {
    val p1 = Lstm.glorotInit(F, seed = 42L)
    val p2 = Lstm.glorotInit(F, seed = 42L)
    assert(p1.enc1.w == p2.enc1.w && p1.out.w == p2.out.w)
    val u = p1.enc1.units
    assert((u until 2 * u).forall(p1.enc1.b(_) == 1.0)) // forget-gate bias 1
    assert((0 until u).forall(p1.enc1.b(_) == 0.0))
  }

  test("mse: zero iff identical; matches hand computation (A6)") {
    val x = DenseMatrix((1.0, 2.0), (3.0, 4.0))
    assert(Lstm.mse(x, x) == 0.0)
    val y = DenseMatrix((2.0, 2.0), (3.0, 0.0))
    assert(math.abs(Lstm.mse(x, y) - (1.0 + 16.0) / 4) < 1e-12)
  }

  test("perFeatureMse averages over the time axis (A8)") {
    val x = DenseMatrix((1.0, 0.0), (3.0, 0.0))
    val y = DenseMatrix((2.0, 0.0), (5.0, 0.0))
    val m = Lstm.perFeatureMse(x, y)
    assert(m.toSeq == Seq((1.0 + 4.0) / 2, 0.0))
  }

  test("weights JSON round-trip reproduces the forward pass exactly (S9)") {
    val p = java.nio.file.Files.createTempFile("lstm", ".json").toString
    Lstm.save(params, p)
    val loaded = Lstm.load(p)
    val x = window(20)
    assert(Lstm.forward(loaded, x) == Lstm.forward(params, x))
  }

  test("runLayer state evolves over time (not constant)") {
    val hs = Lstm.runLayer(params.enc1, window(5))
    assert(hs(0, ::).t != hs(4, ::).t)
  }
}

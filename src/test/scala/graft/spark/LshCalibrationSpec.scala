package graft.spark

import graft.operators.LshCalibration
import org.scalatest.funsuite.AnyFunSuite

class LshCalibrationSpec extends AnyFunSuite with SparkSuiteBase {

  test("square-chain probability agrees with library pow") {
    for {
      (b, r) <- LshCalibration.DefaultConfigs
      k <- 1 until 100
    } {
      val t = k / 100.0
      val chain = LshCalibration.collisionProbability(t, b, r)
      val lib = 1.0 - math.pow(1.0 - math.pow(t, r), b)
      assert(math.abs(chain - lib) < 1e-12, s"(b=$b,r=$r,t=$t)")
    }
  }

  test("curve DataFrame matches the scalar chain exactly and is monotone") {
    val rows = LshCalibration.curve(spark).collect()
    assert(rows.length == 3 * 99)
    rows.foreach { row =>
      val (b, r, pct, ppb) =
        (row.getInt(0), row.getInt(1), row.getInt(2), row.getLong(3))
      val p = LshCalibration.collisionProbability(pct / 100.0, b, r)
      assert(ppb == math.floor(p * 1.0e9 + 0.5).toLong, s"(b=$b,r=$r,pct=$pct)")
    }
    LshCalibration.DefaultConfigs.foreach { case (b, r) =>
      val ps = rows.filter(x => x.getInt(0) == b && x.getInt(1) == r)
        .sortBy(_.getInt(2)).map(_.getLong(3))
      assert(ps.zip(ps.tail).forall { case (a, c) => a <= c },
        s"S-curve must be monotone for (b=$b,r=$r)")
    }
  }

  test("the pipeline's 16x8 config backs the recall >= 0.99 target at t=0.9") {
    val p = LshCalibration.collisionProbability(0.9, 16, 8)
    assert(p > 0.9998)
    // midpoint sits near (1/16)^(1/8): below 0.65 the curve is quiet,
    // above 0.76 it is committed
    assert(LshCalibration.collisionProbability(0.65, 16, 8) < 0.5)
    assert(LshCalibration.collisionProbability(0.76, 16, 8) > 0.5)
  }

  test("non-power-of-two configs are refused loudly") {
    intercept[IllegalArgumentException] {
      LshCalibration.collisionProbability(0.5, 20, 5)
    }
  }

  test("design picks fewest bands meeting the recall target") {
    // the pipeline's pinned operating point is exactly the designed one
    assert(LshCalibration.design(128, 0.9, 990000000L) === ((16, 8)))
    // lower thresholds need wider bands (more, shorter) to keep recall...
    assert(LshCalibration.design(128, 0.7, 990000000L) === ((32, 4)))
    // ...but never more than recall demands: at t=0.5, 64x2 already
    // clears 0.99 while 32x4 reads only ~0.873
    assert(LshCalibration.design(128, 0.5, 990000000L) === ((64, 2)))
    // chosen band count is monotone non-increasing in the threshold
    val picks = Seq(0.3, 0.5, 0.7, 0.8, 0.9, 0.95)
      .map(t => LshCalibration.design(128, t, 990000000L)._1)
    assert(picks.zip(picks.tail).forall { case (a, b) => a >= b }, picks.toString)
    // every pick actually meets the target it was selected for
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val (b, r) = LshCalibration.design(128, t, 990000000L)
      assert(LshCalibration.collisionPpb(t, b, r) >= 990000000L)
    }
    // infeasible ask: fall back to the highest-recall config, loudly NOT
    // meeting the target (caller must grow the signature)
    val (fb, fr) = LshCalibration.design(4, 0.2, 999000000L)
    assert((fb, fr) === ((4, 1)))
    assert(LshCalibration.collisionPpb(0.2, fb, fr) < 999000000L)
    // configsFor spans the full factorization lattice, bands descending
    assert(LshCalibration.configsFor(128).head === ((128, 1)))
    assert(LshCalibration.configsFor(128).last === ((1, 128)))
    assert(LshCalibration.configsFor(128).length === 8)
  }
}

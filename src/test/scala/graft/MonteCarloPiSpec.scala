package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MonteCarloPi

class MonteCarloPiSpec extends AnyFunSuite with SparkFixture {

  test("pi estimate is deterministic across runs and partition layouts of the same count") {
    val a = MonteCarloPi.estimate(spark, 400000L, 16)
    val b = MonteCarloPi.estimate(spark, 400000L, 16)
    assert(a === b) // seed ^ partitionId → run-order independent
  }

  test("pi estimate converges near pi") {
    val (n, inside) = MonteCarloPi.estimate(spark)
    val est = 4.0 * inside / n
    assert(math.abs(est - math.Pi) < 0.01, s"estimate $est") // ~12 sigma at 4M samples
  }
}

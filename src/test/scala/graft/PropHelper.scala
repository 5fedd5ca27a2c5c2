package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check driver (the scalatestplus
  * bridge isn't in the offline artifact cache; raw ScalaCheck is). */
object PropHelper {
  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }
}

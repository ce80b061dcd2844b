package graft.core

/** Deterministic splitmix64 — the engine's only randomness source.
  * Keyed by row id (never by partition/task), so generated data is
  * byte-identical across partition counts and cluster sizes — a
  * precondition for the exact-resume and scaling-efficiency checks.
  */
final class Rng(seed0: Long) {
  private var state: Long = seed0

  def nextLong(): Long = {
    state += 0x9e3779b97f4a7c15L
    var z = state
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform in [0, n). */
  def nextInt(n: Int): Int = {
    val v = nextLong() >>> 1
    (v % n).toInt
  }

  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

object Rng {
  def mix(a: Long, b: Long): Long = {
    var z = a * 0xff51afd7ed558ccdL + b
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    h
  }
}

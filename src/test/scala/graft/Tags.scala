package graft

/** Marks tests excluded from the default `sbt test` lane (r16, verdict
  * task #1: the full 37-minute suite blew the driver's test budget —
  * `tests_ok: false` with no failing assertion in the r15 tail). Tagged
  * suites still compile in every run and execute in the full lane:
  *
  *   sbt -Dgraft.slowTests=true test
  *
  * Only whole-inventory MEASUREMENT sweeps belong here (ScalingSpec's
  * four-tier shuffle-volume fits — ~8.5 min on their own, measurement
  * gates rather than correctness gates); every correctness assertion
  * (goldens, determinism axes, plan shapes, operator semantics, oracle
  * parity) stays in the default lane. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")

package graft

/** O22 — liveness/readiness (reference main.py:33-47). */
class HealthSpec extends SparkTestBase {

  test("ping answers SELECT 1") {
    assert(Health.ping(spark))
  }

  test("readiness sees a registered executor") {
    assert(Health.ready(spark))
  }
}

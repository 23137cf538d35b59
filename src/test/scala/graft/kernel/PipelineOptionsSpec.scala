package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ConvertKernel.ConversionConfig

/** Port of tests/test_pipeline_options_isolation.py:11-50 (O8). The
  * reference regression-tests that per-request options never mutate shared
  * converter state; here ConversionConfig is an immutable case class, so
  * the historical bug is impossible-by-construction — these tests pin the
  * same observable contract anyway.
  */
class PipelineOptionsSpec extends AnyFunSuite {

  private val shared = ConversionConfig() // the converter-wide defaults

  // test_build_does_not_mutate_shared_pipeline_options
  test("building per-request options does not change the shared defaults") {
    shared.withOverrides(extractTables = true, scale = 2)
    assert(shared.imageResolutionScale == 4)
    assert(!shared.extractTablesAsImages)
  }

  // test_build_returns_a_new_options_instance_each_call
  test("each build returns a distinct instance") {
    val first = shared.withOverrides(extractTables = true, scale = 2)
    val second = shared.withOverrides(extractTables = false, scale = 4)
    assert(!(first eq second))
    assert(!(first eq shared))
    assert(!(second eq shared))
  }

  // test_options_do_not_leak_between_sequential_conversions
  test("options do not leak between sequential conversions") {
    val requestA = shared.withOverrides(extractTables = true, scale = 1)
    val requestB = shared.withOverrides(extractTables = false, scale = 4)
    assert(requestA.extractTablesAsImages)
    assert(requestA.imageResolutionScale == 1)
    assert(!requestB.extractTablesAsImages)
    assert(requestB.imageResolutionScale == 4)
  }

  // test_mutating_returned_options_does_not_affect_the_converter —
  // immutability makes mutation inexpressible; the nearest observable is
  // that copies never alias the shared instance (covered above) and the
  // scale clamp holds at construction.
  test("scale outside [1,4] is rejected at construction (route.py ge/le clamp)") {
    intercept[IllegalArgumentException](ConversionConfig(imageResolutionScale = 0))
    intercept[IllegalArgumentException](ConversionConfig(imageResolutionScale = 5))
    intercept[IllegalArgumentException](shared.withOverrides(extractTables = false, scale = 9))
    assert(ConversionConfig(imageResolutionScale = 1).imageResolutionScale == 1)
    assert(ConversionConfig(imageResolutionScale = 4).imageResolutionScale == 4)
  }
}

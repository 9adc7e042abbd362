package graft

import org.scalatest.funsuite.AnyFunSuite

/** ADVICE r12 #4: SF parsing is centralized and exact — prefix tokens
  * (sf10, sf1.5) must NOT scale as sf1. */
class SfDirSpec extends AnyFunSuite {
  import graft.core.SfDir

  test("known tags parse exactly") {
    assert(SfDir.multiplier("/root/testdata/sf0.001") == 1L)
    assert(SfDir.multiplier("/root/testdata/sf0.01") == 10L)
    assert(SfDir.multiplier("/root/testdata/sf0.1") == 100L)
    assert(SfDir.multiplier("/root/testdata/sf1") == 1000L)
  }

  test("rehearsal fixture dirs parse by trailing tag") {
    assert(SfDir.multiplier("/dev/shm/graft-sf1") == 1000L)
    assert(SfDir.multiplier("/dev/shm/graft-sf0.1") == 100L)
  }

  test("prefix-token lookalikes fall to base, never misclassify") {
    assert(SfDir.multiplier("/data/sf10") == 1L)
    assert(SfDir.multiplier("/data/sf1.5") == 1L)
    assert(SfDir.multiplier("/data/sf0.15") == 1L)
    assert(SfDir.multiplier("/transfer1/data") == 1L)
    assert(SfDir.multiplier("/data/plain") == 1L)
  }

  test("tag in a middle component does not override the last one") {
    assert(SfDir.multiplier("/bench/sf1/out-sf0.1") == 100L)
  }

  test("scaled multiplies the base") {
    assert(SfDir.scaled("/root/testdata/sf0.1", 6000L) == 600000L)
    assert(SfDir.scaled("/dev/shm/graft-sf1", 500L) == 500000L)
  }
}

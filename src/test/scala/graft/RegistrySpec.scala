package graft

/** Every registered query must run on the smallest scale factor, return
  * rows, and have column names that match what its oracle SQL produces
  * (the driver hashes columns sorted by name, so a drifted alias is an
  * automatic mismatch even when values agree).
  */
class RegistrySpec extends SparkSpec {

  test("registry keys are unique") {
    val names = SparkEntry.registry.map(_._1)
    assert(names.distinct.size == names.size)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, q) <- SparkEntry.registry) {
    test(s"$name runs on sf0.001 and returns rows") {
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}

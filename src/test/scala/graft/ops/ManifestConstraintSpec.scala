package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK constraints on manifest tables: validated on ADD against
  * existing rows, enforced on every write inside the stats read-back
  * pass, atomic on violation (nothing committed, orphans vacuumable). */
class ManifestConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def newDir() =
    Files.createTempDirectory("graft-constraint").toString + "/tbl"

  private def base = spark.range(1, 101)
    .select($"id".as("k"), ($"id" * 1.0).as("v"), ($"id" / 50).cast("long").as("p"))

  test("add + enforce: a violating append aborts atomically, a clean one lands") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.addConstraint(spark, dir, "v_positive", "v > 0")
    assert(Manifest.constraintsOf(spark, dir) == Seq("v_positive" -> "v > 0"))

    Manifest.append(spark, dir, Seq((200L, 1.5, 4L)).toDF("k", "v", "p"), "p")
    assert(Manifest.read(spark, dir).count() == 101)

    val vsBefore = Manifest.versions(spark, dir)
    val e = intercept[Manifest.ConstraintViolationException] {
      Manifest.append(spark, dir,
        Seq((201L, -3.0, 4L), (202L, 2.0, 4L)).toDF("k", "v", "p"), "p")
    }
    assert(e.name == "v_positive" && e.rows == 1)
    // NOTHING committed: same versions, same rows, clean rows NOT in
    assert(Manifest.versions(spark, dir) == vsBefore)
    assert(Manifest.read(spark, dir).count() == 101)
    // the staged files are orphans; vacuum reclaims them
    assert(Manifest.vacuumOrphans(spark, dir, keepVersions = 3, staleMillis = 0L) > 0)
    assert(Manifest.read(spark, dir).count() == 101)
  }

  test("adding a constraint the existing data violates is rejected") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    val e = intercept[Manifest.ConstraintViolationException] {
      Manifest.addConstraint(spark, dir, "v_small", "v < 50")
    }
    assert(e.rows == 51) // v in 50.0..100.0
    assert(Manifest.constraintsOf(spark, dir).isEmpty)
  }

  test("SQL-standard null semantics: UNKNOWN passes, IS NOT NULL catches") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.addConstraint(spark, dir, "v_positive", "v > 0")
    // null v → UNKNOWN → passes the CHECK
    Manifest.append(spark, dir,
      Seq((300L, Option.empty[Double], 4L)).toDF("k", "v", "p"), "p")
    assert(Manifest.read(spark, dir).filter($"v".isNull).count() == 1)
    // an explicit NOT NULL constraint then rejects (existing null must
    // be deleted first — which also proves add-time validation sees it)
    intercept[Manifest.ConstraintViolationException] {
      Manifest.addConstraint(spark, dir, "v_not_null", "v IS NOT NULL")
    }
    Manifest.delete(spark, dir, Seq((300L, 4L)).toDF("k", "p"), Seq("k"), "p")
    Manifest.addConstraint(spark, dir, "v_not_null", "v IS NOT NULL")
    intercept[Manifest.ConstraintViolationException] {
      Manifest.append(spark, dir,
        Seq((301L, Option.empty[Double], 4L)).toDF("k", "v", "p"), "p")
    }
  }

  test("upserts and MoR upserts enforce; drop lifts enforcement") {
    val dir = newDir()
    Manifest.create(spark, dir, base, "p")
    Manifest.addConstraint(spark, dir, "v_positive", "v > 0")
    intercept[Manifest.ConstraintViolationException] {
      Manifest.upsert(spark, dir, Seq((5L, -1.0, 0L)).toDF("k", "v", "p"),
        Seq("k"), "p")
    }
    intercept[Manifest.ConstraintViolationException] {
      Manifest.upsertMor(spark, dir, Seq((5L, -1.0, 0L)).toDF("k", "v", "p"),
        Seq("k"), "p")
    }
    assert(Manifest.read(spark, dir).filter($"k" === 5L)
      .select("v").head().getDouble(0) == 5.0)

    Manifest.dropConstraint(spark, dir, "v_positive")
    Manifest.upsert(spark, dir, Seq((5L, -1.0, 0L)).toDF("k", "v", "p"),
      Seq("k"), "p")
    assert(Manifest.read(spark, dir).filter($"k" === 5L)
      .select("v").head().getDouble(0) == -1.0)
    intercept[IllegalArgumentException] {
      Manifest.dropConstraint(spark, dir, "v_positive")
    }
  }
}

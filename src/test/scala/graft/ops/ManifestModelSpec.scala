package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** MODEL-BASED property test of the manifest op algebra: random
  * sequences of table operations run against both the real table and a
  * driver-side `Map[Long, (Double, Long)]` model, asserting after EVERY
  * step that (a) the table equals the model and (b) the change feed
  * from the previous version replays the step's net effect. This is the
  * interaction coverage the per-op specs can't give — e.g. a MoR delete
  * followed by a CoW upsert of the same partition followed by cluster
  * followed by a feed read crosses four subsystems' invariants in one
  * sequence. Fixed seeds, so any failure replays. */
class ManifestModelSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: (A, Int) => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)), i)
    }

  sealed trait Op
  case class Append(rows: Seq[(Long, Double)]) extends Op
  case class Upsert(rows: Seq[(Long, Double)], mor: Boolean) extends Op
  case class Delete(keys: Seq[Long], mor: Boolean) extends Op
  case object Compact extends Op
  case object Materialize extends Op
  case object Cluster extends Op
  case object Rename extends Op
  case object DropUndrop extends Op
  case object Restore extends Op
  case object Widen extends Op
  /** Predicate delete through the three-tier planner: kind 0 = exact
    * partition tier (`p = 0`), 1 = stats tier on the value column,
    * 2 = unprunable key predicate (every file a straddler). */
  case class DeleteWhere(mor: Boolean, kind: Int) extends Op
  /** Predicate update (CoW rewrite / MoR vector + re-insert) of the
    * value column across one partition. */
  case class UpdateWhere(mor: Boolean) extends Op

  private val keyGen = Gen.choose(1L, 40L)
  private val rowsGen = for {
    n <- Gen.choose(1, 6)
    ks <- Gen.pick(n, 1L to 40L)
    vs <- Gen.listOfN(n, Gen.choose(1, 999))
  } yield ks.toSeq.zip(vs.map(_.toDouble))

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> rowsGen.map(Append.apply),
    4 -> (for { r <- rowsGen; m <- Gen.oneOf(true, false) } yield Upsert(r, m)),
    4 -> (for {
      n <- Gen.choose(1, 5); ks <- Gen.pick(n, 1L to 40L)
      m <- Gen.oneOf(true, false)
    } yield Delete(ks.toSeq, m)),
    1 -> Gen.const(Compact),
    1 -> Gen.const(Materialize),
    1 -> Gen.const(Cluster),
    1 -> Gen.const(Rename),
    1 -> Gen.const(DropUndrop),
    1 -> Gen.const(Restore),
    1 -> Gen.const(Widen),
    2 -> (for { m <- Gen.oneOf(true, false); k <- Gen.choose(0, 2) }
      yield DeleteWhere(m, k)),
    2 -> Gen.oneOf(true, false).map(UpdateWhere.apply))

  private val seqGen: Gen[List[Op]] =
    Gen.choose(4, 9).flatMap(n => Gen.listOfN(n, opGen))

  private def part(k: Long): Long = k % 3

  /** `q` is a derived int column that the Widen op re-types to bigint
    * mid-sequence — batches must speak the table's CURRENT type. */
  private def toDf(rows: Seq[(Long, Double)], valCol: String,
                   qWide: Boolean) =
    rows.toDF("k", valCol).select(col("k"), col(valCol),
      (col("k") % 3).as("p"),
      (col("k") % 100).cast(if (qWide) "bigint" else "int").as("q"))

  /** Row MULTISET (sorted seq, not a map): a duplicate-row corruption
    * must fail the compare, not collapse into one arbitrary entry. */
  private def tableState(dir: String, valCol: String): Seq[(Long, Double)] =
    Manifest.read(spark, dir).select("k", valCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted

  test("random op sequences: table == model and the feed replays every step") {
    forSamples(seqGen, 12) { (ops, caseId) =>
      val dir = Files.createTempDirectory(s"graft-model-$caseId").toString + "/t"
      var model = Map[Long, Double](1L -> 1.0, 2L -> 2.0, 9L -> 9.0)
      // the CURRENT logical name of the value column — Rename flips it,
      // and every subsequent op (and compare) must speak the new name
      var valCol = "v"
      // whether q has been widened int→bigint (Restore can REWIND it,
      // resurrecting the narrow sentinel — later writes must re-narrow)
      var qWide = false
      Manifest.create(spark, dir, toDf(model.toSeq, valCol, qWide), "p",
        statsCols = Seq("v"), bloomCols = Seq("k", "q"))
      // per-version (state, face, q-width) ledger: Restore rewinds the
      // model to what the table held at the target version
      var recorded = Map[Long, (Map[Long, Double], String, Boolean)](
        1L -> ((model, valCol, qWide)))

      ops.foreach { op =>
        val vBefore = Manifest.latestVersion(spark, dir).get
        val before = model
        op match {
          case Append(rows) =>
            // appends must not duplicate live keys (append is not merge)
            val fresh = rows.filterNot { case (k, _) => model.contains(k) }
              .distinctBy(_._1)
            if (fresh.nonEmpty) {
              Manifest.append(spark, dir, toDf(fresh, valCol, qWide), "p")
              model = model ++ fresh
            }
          case Upsert(rows, mor) =>
            val batch = rows.distinctBy(_._1)
            if (mor) Manifest.upsertMor(spark, dir,
              toDf(batch, valCol, qWide), Seq("k"), "p")
            else Manifest.upsert(spark, dir, toDf(batch, valCol, qWide),
              Seq("k"), "p")
            model = model ++ batch
          case Delete(keys, mor) =>
            val batch = keys.distinct.map(k => (k, part(k))).toDF("k", "p")
            if (mor) Manifest.deleteMor(spark, dir, batch, Seq("k"), "p")
            else Manifest.delete(spark, dir, batch, Seq("k"), "p")
            model = model -- keys
          case Compact =>
            Manifest.compact(spark, dir, "p",
              smallBytes = Long.MaxValue, targetBytes = Long.MaxValue)
          case Materialize => Manifest.materialize(spark, dir, "p")
          case Cluster =>
            Manifest.cluster(spark, dir, "p", valCol, targetBytes = 1L << 16)
          case Rename =>
            val next = if (valCol == "v") "w" else "v"
            Manifest.renameColumn(spark, dir, valCol, next)
            valCol = next // model values unchanged: rename is metadata
          case DropUndrop =>
            // drop the value column (hidden, not lost), then re-bind its
            // physical slot (always "v" — no evolve in this alphabet)
            // under the flipped name: net metadata-only, values intact
            Manifest.dropColumn(spark, dir, valCol)
            assert(Manifest.read(spark, dir).columns.toSeq ==
              Seq("k", "p", "q"),
              s"case $caseId: drop must hide $valCol")
            val next = if (valCol == "v") "w" else "v"
            Manifest.undropColumn(spark, dir, "v", next)
            valCol = next
          case Restore =>
            // rewind to the middle retained version (deterministic pick)
            val vs = Manifest.versions(spark, dir)
            val target = vs(vs.length / 2)
            Manifest.restore(spark, dir, target)
            val (m2, c2, q2) = recorded(target)
            model = m2
            valCol = c2
            qWide = q2
          case Widen =>
            // metadata-only int→bigint on q (once; values unchanged);
            // q is a bloom column, so the widen also drops its bloom —
            // later keyed writes must stay exact without it
            if (!qWide) {
              Manifest.widenColumn(spark, dir, "q", "bigint")
              qWide = true
            }
          case DeleteWhere(mor, kind) =>
            val pred = kind match {
              case 0 => "p = 0"
              case 1 => s"$valCol >= 500.0"
              case _ => "k % 5 = 1"
            }
            if (mor) Manifest.deleteWhereMor(spark, dir, pred, "p")
            else Manifest.deleteWhere(spark, dir, pred, "p")
            model = model.filterNot { case (k, v) =>
              kind match {
                case 0 => part(k) == 0
                case 1 => v >= 500.0
                case _ => k % 5 == 1
              }
            }
          case UpdateWhere(mor) =>
            val setE = Seq(valCol -> s"$valCol + 1000.0")
            if (mor) Manifest.updateWhereMor(spark, dir, setE, "p = 1", "p")
            else Manifest.updateWhere(spark, dir, setE, "p = 1", "p")
            model = model.map { case (k, v) =>
              k -> (if (part(k) == 1) v + 1000.0 else v)
            }
        }
        val vAfter = Manifest.latestVersion(spark, dir).get
        recorded += vAfter -> ((model, valCol, qWide))
        assert(tableState(dir, valCol) == model.toSeq.sorted,
          s"case $caseId diverged after $op (v$vBefore->v$vAfter)")

        // feed replay: fold the step's changes over the BEFORE state
        if (vAfter > vBefore) {
          val feed = Manifest.changes(spark, dir, vBefore, vAfter)
            .select("k", valCol, "change").collect()
          val ins = feed.filter(_.getString(2) == "insert")
          assert(ins.map(_.getLong(0)).distinct.length == ins.length,
            s"case $caseId: duplicate insert keys in one step's feed")
          val afterDeletes = before -- feed
            .filter(_.getString(2) == "delete").map(_.getLong(0))
          val replayed = afterDeletes ++ feed
            .filter(_.getString(2) == "insert")
            .map(r => r.getLong(0) -> r.getDouble(1))
          assert(replayed == model,
            s"case $caseId feed replay diverged after $op")
        }
      }

      // time travel back to v1 still shows the initial relation
      assert(Manifest.readVersion(spark, dir, 1L).count() == 3)
    }
  }
}

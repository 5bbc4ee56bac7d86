package graft.sources

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import scala.collection.mutable
import scala.util.Random

import graft.SparkSuite

/** Differential fuzzer for [[SnapshotCopyInto]] — the
  * SnapshotMergeFuzzSpec shape: seeded random op sequences against an
  * INDEPENDENT model that re-derives the contract from scratch
  * (candidate window + digest dedup + force), then multiset-compares
  * the table's rows after every COPY. The model never looks at the
  * ledger properties; only at its own record of what was on disk and
  * what a correct COPY must have loaded — so a ledger bug (dropped
  * key, wrong digest, expiry eating a live entry) diverges the row
  * multiset and names the seed.
  *
  * Time is VIRTUAL: file mtimes are set explicitly and `nowMs` is
  * injected, so lookback expiry and window exit are deterministic.
  * Rewrites always bump mtime (same-mtime-and-size rewrites are
  * outside the identity contract by design — documented in the
  * engine's scaladoc). */
class SnapshotCopyIntoFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val LookbackDays = 3
  private val Day = 86400000L

  /** One fuzz scenario: `steps` random ops, model-checked COPYs. */
  private def runSeed(seed: Int, steps: Int): Unit = {
    val rng = new Random(seed)
    val drop = Files.createTempDirectory(s"copyfuzz$seed")
    val t = new SnapshotTable(spark,
      Files.createTempDirectory(s"copyfuzztab$seed").toString)
    t.appendWithStats(Seq.empty[(Long, Long)].toDF("id", "k"), Nil)

    var now = 1700000000000L // virtual clock
    var nextId = 0L
    // disk state: path -> (mtime, rows currently in the file)
    val disk = mutable.Map.empty[String, (Long, Seq[(Long, Long)])]
    // model ledger: loaded (path, mtime, size) identities — kept
    // FOREVER (an expired candidate can never reappear, so entry
    // expiry is unobservable in rows; the bounded-ledger property is
    // asserted separately at the end)
    val loaded = mutable.Set.empty[(String, Long, Long)]
    val expectedRows = mutable.Buffer.empty[(Long, Long)]

    def writeFile(name: String, rows: Seq[(Long, Long)], mtime: Long): Unit = {
      val p = drop.resolve(name)
      Files.write(p, ("id,k" +: rows.map { case (a, b) => s"$a,$b" })
        .mkString("\n").getBytes("UTF-8"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(mtime))
      disk(p.toString) = (mtime, rows)
    }
    def sizeOf(p: String): Long = Files.size(java.nio.file.Paths.get(p))
    def freshRows(): Seq[(Long, Long)] = {
      val n = 1 + rng.nextInt(4)
      (0 until n).map { _ => nextId += 1; (nextId, rng.nextInt(5).toLong) }
    }

    (0 until steps).foreach { _ =>
      rng.nextInt(5) match {
        case 0 => // new file
          writeFile(s"f${rng.nextInt(1000)}_${nextId}.csv", freshRows(), now)
        case 1 if disk.nonEmpty => // rewrite an existing file, bump mtime
          val p = disk.keys.toSeq(rng.nextInt(disk.size))
          now += 1000L
          writeFile(java.nio.file.Paths.get(p).getFileName.toString,
            freshRows(), now)
        case 2 => // clock advance — sometimes past the lookback
          now += (if (rng.nextBoolean()) rng.nextInt(2 * LookbackDays) + 1
                  else 0) * Day + rng.nextInt(3600000)
        case _ => // COPY (sometimes force)
          val force = rng.nextInt(4) == 0
          val before = t.currentVersion
          val r = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
            Map("header" -> "true"), force = force,
            lookbackDays = LookbackDays, nowMs = now)
          // the model re-derives what a correct COPY loads
          val horizon = now - LookbackDays * Day
          val candidates = disk.toSeq.collect {
            case (p, (m, rows)) if m >= horizon => (p, m, rows)
          }
          val fresh = candidates.filter { case (p, m, _) =>
            force || !loaded.contains((p, m, sizeOf(p))) }
          fresh.foreach { case (p, m, rows) =>
            loaded += ((p, m, sizeOf(p)))
            expectedRows ++= rows
          }
          assert(r.filesLoaded == fresh.size,
            s"seed $seed: filesLoaded ${r.filesLoaded} != model " +
              s"${fresh.size} (force=$force now=$now)")
          if (fresh.isEmpty)
            assert(t.currentVersion == before,
              s"seed $seed: empty COPY must commit nothing")
      }
    }
    // final differential: the table's multiset == the model's
    val got = t.read().as[(Long, Long)].collect().sorted.toSeq
    assert(got == expectedRows.sorted.toSeq,
      s"seed $seed: table rows diverge from the model " +
        s"(${got.size} vs ${expectedRows.size})")
    // bounded-ledger property: retained keys only cover the lookback
    val keys = t.properties().keys
      .count(_.startsWith(SnapshotCopyInto.LedgerPrefix))
    assert(keys <= steps, s"seed $seed: ledger key count $keys unbounded")
  }

  test("seeded differential scenarios match the model") {
    (1 to 10).foreach(seed => runSeed(seed, steps = 18))
  }

  test("long-horizon scenario: expiry keeps the ledger bounded") {
    // many copy rounds, each in its own lookback window: every round's
    // key fully expires by the round after next — the retained key
    // count must stay O(1), not O(rounds)
    val drop = Files.createTempDirectory("copyfuzzexp")
    val t = new SnapshotTable(spark,
      Files.createTempDirectory("copyfuzzexptab").toString)
    t.appendWithStats(Seq.empty[(Long, Long)].toDF("id", "k"), Nil)
    var now = 1700000000000L
    (1 to 8).foreach { i =>
      val p = drop.resolve(s"r$i.csv")
      Files.write(p, s"id,k\n$i,$i".getBytes("UTF-8"))
      Files.setLastModifiedTime(p, FileTime.fromMillis(now))
      val r = SnapshotCopyInto.copyInto(t, drop.toString, "csv",
        Map("header" -> "true"), lookbackDays = LookbackDays, nowMs = now)
      assert(r.filesLoaded == 1, s"round $i loaded ${r.filesLoaded}")
      now += (LookbackDays + 1) * Day
    }
    assert(t.read().count() == 8)
    val keys = t.properties().keys
      .count(_.startsWith(SnapshotCopyInto.LedgerPrefix))
    assert(keys <= 2,
      s"ledger must stay bounded by the lookback window, got $keys keys")
  }
}

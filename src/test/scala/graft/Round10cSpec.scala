package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

/** Round-10 directive #6 witnesses: the [[Sources.CommitStore]]
  * abstraction behind I20's optimistic commit. The SAME claim loop now
  * runs over two realizations — POSIX atomic rename and an in-memory
  * conditional-PUT (if-none-match) object-store double — and both must
  * satisfy the identical no-lost-write / dense-ids suite. Plus the
  * round-9 ADVICE low the refactor closes: a NON-conflict store error
  * must surface immediately, never spin through the id space.
  */
class Round10cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The object-store realization as an in-memory double: a per-id
    * manifest object written with an if-none-match conditional PUT
    * (putIfAbsent IS the conditional PUT — exactly one writer's
    * manifest lands; the manifest carries the staged location, so
    * claim and data-pointer publish are one atomic operation).
    */
  final class ConditionalPutStore extends Sources.CommitStore {
    val objects = new java.util.concurrent.ConcurrentHashMap[String, String]()
    override def prepare(logPath: String, stagedPath: String): Unit = ()
    override def tryClaim(logPath: String, stagedPath: String, id: Long): Boolean =
      objects.putIfAbsent(s"$logPath/_batch_id=$id", stagedPath) == null
    def committedIds(logPath: String): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      objects.keySet.asScala.toSeq
        .filter(_.startsWith(s"$logPath/_batch_id="))
        .map(_.split("=").last.toLong).sorted
    }
  }

  test("8 concurrent writers over the conditional-PUT double: dense ids, no lost write") {
    val store = new ConditionalPutStore
    val log = "mem://corpus-log"
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      // every writer computes the SAME optimistic candidate (an empty
      // log) — the worst-case stampede Round9cSpec drives over POSIX
      val futures = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[(Int, Long)] {
          def call(): (Int, Long) =
            w -> Sources.commitStagedFrom(log, s"staged-of-writer-$w", 1L, store)
        })
      }
      val claimed = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // dense, distinct ids 1..8: every claim either published or didn't happen
      assert(claimed.map(_._2).sorted == (1L to writers.toLong),
        s"ids not dense: $claimed")
      assert(store.committedIds(log) == (1L to writers.toLong))
      // claim ≡ publish: each id's manifest points at exactly the
      // winning writer's staged batch (no lost write, no cross-wiring)
      claimed.foreach { case (w, id) =>
        assert(store.objects.get(s"$log/_batch_id=$id") == s"staged-of-writer-$w",
          s"writer $w's claim of id $id lost its data pointer")
      }
    } finally pool.shutdown()
  }

  test("stale candidate retries over the double exactly like POSIX") {
    val store = new ConditionalPutStore
    val log = "mem://log2"
    assert(Sources.commitStagedFrom(log, "a", 1L, store) == 1L)
    assert(Sources.commitStagedFrom(log, "b", 1L, store) == 2L) // stale 1 → conflict → 2
    assert(Sources.commitStagedFrom(log, "c", 1L, store) == 3L)
    assert(store.committedIds(log) == Seq(1L, 2L, 3L))
  }

  // --- ADVICE low #3 (round 9): the claim loop must NOT treat a
  // non-conflict store failure as a conflict — a persistent
  // AccessDenied-style error previously spun through 100000 rename
  // attempts and died with a misleading exhausted-claims message.
  test("a non-conflict store error surfaces immediately, not after 100000 retries") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val broken = new Sources.CommitStore {
      override def prepare(logPath: String, stagedPath: String): Unit = ()
      override def tryClaim(logPath: String, stagedPath: String, id: Long): Boolean = {
        attempts.incrementAndGet()
        throw new java.nio.file.AccessDeniedException(logPath)
      }
    }
    intercept[java.nio.file.AccessDeniedException] {
      Sources.commitStagedFrom("denied://log", "s", 1L, broken)
    }
    assert(attempts.get() == 1,
      s"non-conflict error was retried ${attempts.get()} times")
  }

  test("POSIX store propagates a vanished staging dir instead of retrying") {
    val log = graft.Scratch.dir("cstore_posix")
    // a staging path that does not exist: prepare must refuse loudly
    val e = intercept[IllegalArgumentException] {
      Sources.commitStagedFrom(log, s"$log/.staging/never-existed", 1L)
    }
    assert(e.getMessage.contains("no staged batch"))
  }
}

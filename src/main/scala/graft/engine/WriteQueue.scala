package graft.engine

import java.util.concurrent.{ConcurrentHashMap, Semaphore}
import java.util.concurrent.locks.ReentrantLock

/** Per-(database, branch) write serialization (B3).
  *
  * The reference runs writes through a 1000-capacity channel drained by a
  * single goroutine per db+branch (pkg/database/write_queue.go:9-130).
  * The JVM equivalent with identical semantics: a fair lock (FIFO hand-off,
  * one writer at a time) guarded by a 1000-permit semaphore (queue
  * capacity). A full queue rejects, as the reference's channel would block
  * its caller.
  */
class WriteQueue(capacity: Int = 1000) {
  private val lock = new ReentrantLock(true) // fair = FIFO
  private val slots = new Semaphore(capacity)

  def run[T](f: => T): T = {
    if (!slots.tryAcquire())
      throw new IllegalStateException("write queue full")
    try {
      lock.lock()
      try f finally lock.unlock()
    } finally slots.release()
  }

  def queued: Int = capacity - slots.availablePermits()
}

/** Lazy per-key write queues (reference write_queue_manager.go). */
class WriteQueueManager {
  private val queues = new ConcurrentHashMap[(String, String), WriteQueue]()
  def apply(db: String, branch: String): WriteQueue =
    queues.computeIfAbsent((db, branch), _ => new WriteQueue())
}

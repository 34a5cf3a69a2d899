package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Scratch directories that clean themselves up on JVM exit.
  *
  * Query operators that exercise a write→read round-trip (CSV, ORC,
  * JSONL, catalog export) need a scratch dir that is unique per use —
  * a fixed name would race two concurrent JVMs, one overwrite deleting
  * files the other is mid-read. Some callers reuse one dir per JVM
  * (FormatQueries' lazy vals), others take a fresh dir per invocation
  * (EtlQueries — the write is part of the timed query either way);
  * both previously leaked every dir forever (ADVICE r7: one stranded
  * copy of the data slice per dir, ~35 accumulated in /tmp). A
  * shutdown hook per dir removes the tree when the JVM exits.
  */
object TempDirs {

  /** Create a unique temp directory removed on JVM exit. */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p.toString
  }

  // fixed-name staging dirs (streaming batch replays) are re-registered
  // on every bench rep; dedupe so a 3-rep run adds one hook, not three.
  // A key SET, not a Boolean-valued map: `putIfAbsent(...) == null` with
  // a Scala primitive value type never compared equal (the unboxed
  // comparison is constant-false — compiler-warned), so no hook was ever
  // registered and every fixed-name dir leaked past JVM exit.
  private val registered = java.util.concurrent.ConcurrentHashMap
    .newKeySet[Path]()

  /** Register an existing directory for removal on JVM exit (idempotent
    * per path). For fixed-name scratch dirs that are deliberately reused
    * within a run. */
  def cleanOnExit(path: Path): Unit =
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(path)))

  /** Depth-first recursive delete; tolerates files already gone. */
  def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }
}

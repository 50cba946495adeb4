package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The corpus content stamp that keys the trained-artifact store: a
  * regenerated corpus (different file bytes) must re-key, an untouched
  * corpus must not, and a corpus the stamp cannot see degrades to the
  * legacy path-keyed behavior. */
class ArtifactStampSpec extends AnyFunSuite {

  private def tmpCorpus(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("stampcorpus")

  private def write(dir: java.nio.file.Path, name: String, n: Int): Unit =
    java.nio.file.Files.write(dir.resolve(name), Array.fill(n)('x'.toByte))

  test("stamp is stable for unchanged content and re-keys on regeneration") {
    val dir = tmpCorpus()
    write(dir, "documents.parquet", 100)
    write(dir, "embeddings.parquet", 50)
    val s1 = ExtensionQueries.corpusStamp(dir.toString)
    val s2 = ExtensionQueries.corpusStamp(dir.toString)
    assert(s1 == s2, "same files must stamp identically")
    assert(s1.matches("[0-9a-f]{8}"), s"stamp shape: $s1")
    // regeneration with different sizes (the r10 failure class)
    write(dir, "documents.parquet", 101)
    val s3 = ExtensionQueries.corpusStamp(dir.toString)
    assert(s3 != s1, "a regenerated corpus must re-key the artifact store")
  }

  test("stamp covers many-file table directories (ScaleUp layout)") {
    val dir = tmpCorpus()
    val sub = dir.resolve("documents.parquet")
    java.nio.file.Files.createDirectory(sub)
    write(dir, "documents.parquet/part-0", 10)
    write(dir, "documents.parquet/part-1", 20)
    val s1 = ExtensionQueries.corpusStamp(dir.toString)
    assert(s1.matches("[0-9a-f]{8}"))
    write(dir, "documents.parquet/part-1", 21)
    assert(ExtensionQueries.corpusStamp(dir.toString) != s1,
      "a changed shard must re-key")
  }

  test("an invisible corpus degrades to the legacy path-keyed behavior") {
    assert(ExtensionQueries.corpusStamp(tmpCorpus().toString) == "nostamp")
  }
}

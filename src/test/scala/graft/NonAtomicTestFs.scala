package graft

/** Test filesystem simulating an object store's scheme: behaves like local
  * disk but is registered under its own scheme so the storage plane's
  * non-atomic-rename guard (graft.log.nonAtomicRenameSchemes) can target it.
  */
class NonAtomicTestFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "natest"
  override def getUri: java.net.URI = java.net.URI.create("natest:///")
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.util.UUID

/** Port of `tests/SqlStreamStore.Tests/Infrastructure/DeterministicGuidGeneratorTests.cs`. */
class DeterministicUuidSpec extends AnyFunSuite {

  test("same input produces same uuid") {
    val a = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "hello world")
    val b = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "hello world")
    assert(a === b)
  }

  test("different input produces different uuid") {
    val a = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "hello world")
    val b = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "hello worlD")
    assert(a !== b)
  }

  test("different namespace produces different uuid") {
    val ns2 = UUID.fromString("00000000-0000-0000-0000-000000000001")
    val a = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "x")
    val b = DeterministicUuid.v5(ns2, "x")
    assert(a !== b)
  }

  test("version and variant bits are set per RFC 4122") {
    val u = DeterministicUuid.v5(DeterministicUuid.DefaultNamespace, "anything")
    assert(u.version === 5)
    assert(u.variant === 2) // IETF RFC 4122 variant
  }

  test("known RFC 4122 appendix vector: v5 of DNS namespace") {
    // RFC 4122 defines uuid5(NamespaceDNS, "www.example.com") (python uuid module)
    val dns = UUID.fromString("6ba7b810-9dad-11d1-80b4-00c04fd430c8")
    val u = DeterministicUuid.v5(dns, "www.example.com")
    assert(u === UUID.fromString("2ed6657d-e927-568b-95e1-2665a8aea6a2"))
  }
}

"""Host linear-algebra primitive tests.

Mirrors the reference's generic Vector-trait tests (vector/mod.rs:85-214)
and permutation tests (carry/lower_upper/permutation)."""

from fractions import Fraction

import numpy as np
import pytest

from relp_tpu.linalg.permutation import (
    FullPermutation,
    IdentityPermutation,
    RotateToBackPermutation,
    SwapPermutation,
)
from relp_tpu.linalg.sparse import SparseColumnMatrix, SparseVector

F = Fraction


# --- sparse vector (reference: Sparse/Dense via the shared Vector tests) ---


def test_sparse_vector_roundtrip():
    dense = [F(0), F(3), F(0), F(-2), F(1, 2)]
    v = SparseVector.from_dense(dense)
    assert v.to_dense() == dense
    assert v.nnz() == 3
    assert v.get(1) == F(3)
    assert v.get(0) == F(0)


def test_sparse_vector_set_and_remove():
    v = SparseVector.from_dense([F(1), F(0), F(2), F(0), F(3)])
    v.set(1, F(7))
    v.set(0, F(0))  # removal via zero
    assert v.to_dense() == [F(0), F(7), F(2), F(0), F(3)]
    v.remove_indices([1, 3])
    assert v.to_dense() == [F(0), F(2), F(3)]


def test_sparse_inner_product():
    a = SparseVector.from_dense([F(1), F(0), F(2), F(3)])
    b = SparseVector.from_dense([F(0), F(5), F(4), F(1)])
    assert a.inner_product(b) == F(11)
    assert b.inner_product(a) == F(11)


def test_sparse_vector_duplicate_index_rejected():
    with pytest.raises(ValueError):
        SparseVector([(0, F(1)), (0, F(2))], 3)


def test_sparse_matrix_ops():
    m = SparseColumnMatrix.from_dense(
        [[F(1), F(0)], [F(2), F(3)], [F(0), F(4)]]
    )
    assert m.get(1, 0) == F(2)
    m.change_row_signs([1])
    assert m.get(1, 0) == F(-2)
    m.remove_rows([0])
    assert m.nr_rows == 2
    assert m.get(0, 0) == F(-2)
    m.remove_columns([0])
    assert m.nr_columns == 1
    assert m.get(1, 0) == F(4)


def test_sparse_matrix_concat_transpose():
    a = SparseColumnMatrix.from_dense([[F(1)], [F(2)]])
    b = SparseColumnMatrix.from_dense([[F(3)], [F(0)]])
    c = a.concatenate_horizontally(b)
    assert c.nr_columns == 2
    rows = c.transpose_entries()
    assert rows[0] == [(0, F(1)), (1, F(3))]
    assert rows[1] == [(0, F(2))]


# --- permutations (reference: permutation/{full,rotate_to_back,swap}.rs) ---


def test_full_permutation():
    p = FullPermutation([2, 0, 1])
    assert [p.forward(i) for i in range(3)] == [2, 0, 1]
    assert [p.backward(i) for i in range(3)] == [1, 2, 0]
    assert p.apply(["a", "b", "c"]) == ["b", "c", "a"]
    assert p.apply_inverse(p.apply(["a", "b", "c"])) == ["a", "b", "c"]
    inv = p.invert()
    assert [inv.forward(i) for i in range(3)] == [1, 2, 0]


def test_rotate_to_back():
    p = RotateToBackPermutation(1, 5)
    assert p.apply([0, 1, 2, 3, 4]) == [0, 2, 3, 4, 1]
    assert p.apply_inverse(p.apply(list("abcde"))) == list("abcde")


def test_swap_and_identity():
    s = SwapPermutation(0, 3, 4)
    assert s.apply([0, 1, 2, 3]) == [3, 1, 2, 0]
    i = IdentityPermutation(3)
    assert i.apply([5, 6, 7]) == [5, 6, 7]


def test_full_from_lapack_piv():
    from scipy.linalg import lu_factor

    rng = np.random.default_rng(3)
    A = rng.standard_normal((6, 6))
    lu, piv = lu_factor(A)
    p = FullPermutation.from_lapack_piv(piv)
    # Permutation applied to rows of A reproduces scipy's P A = L U.
    L = np.tril(lu, -1) + np.eye(6)
    U = np.triu(lu)
    PA = np.array(p.apply([A[i] for i in range(6)]))
    assert np.allclose(PA, L @ U)

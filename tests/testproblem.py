"""TestProblem fixture (parity: reference ``tests/TestProblem.py``)."""
from alan_tpu import no_checkpoint, Problem
from alan_tpu.moments import RawMoment


class TestProblem:
    def __init__(self, P, Q, data, moments, known_moments=None, known_elbo=None,
                 moment_K=30, elbo_K=30, elbo_iters=20, elbo_gap_cat=1,
                 elbo_gap_perm=1, importance_N=1000,
                 computation_strategy=no_checkpoint):
        self.P = P
        self.Q = Q
        self.data = data
        self.moments = moments
        for _, m in moments:
            assert isinstance(m, RawMoment)
        self.known_moments = known_moments or {}
        self.known_elbo = known_elbo
        self.moment_K = moment_K
        self.elbo_K = elbo_K
        self.elbo_iters = elbo_iters
        self.elbo_gap_cat = elbo_gap_cat
        self.elbo_gap_perm = elbo_gap_perm
        self.importance_N = importance_N
        self.computation_strategy = computation_strategy

    @property
    def problem(self):
        return Problem(self.P, self.Q, data=self.data)

"""POA consensus (wtmsa) tests."""

import numpy as np

from smartdenovo_tpu.data.readbank import codes_to_seq
from smartdenovo_tpu.pipeline.cns import LayUnitig
from smartdenovo_tpu.pipeline.msa import MsaParams, msa_unitig
from smartdenovo_tpu.utils.native import PoaCns
from smartdenovo_tpu.utils.simulate import mutate_read, random_genome


def test_poa_identity_passthrough():
    rng = np.random.default_rng(1)
    bb = rng.integers(0, 4, 300).astype(np.uint8)
    g = PoaCns()
    g.init_backbone(bb)
    cns = g.consensus()
    np.testing.assert_array_equal(cns, bb)


def test_poa_majority_correction():
    rng = np.random.default_rng(2)
    truth = rng.integers(0, 4, 500).astype(np.uint8)
    bb = truth.copy()
    bb[250] = (bb[250] + 1) % 4  # backbone error
    g = PoaCns()
    g.init_backbone(bb)
    for s in range(5):
        read = mutate_read(np.random.default_rng(10 + s), truth, 0.03)
        sc = g.align_and_add(read, 0, len(bb))
        assert sc > 0
    cns = g.consensus()
    from difflib import SequenceMatcher

    ident = SequenceMatcher(None, codes_to_seq(cns), codes_to_seq(truth),
                            autojunk=False).ratio()
    assert ident > 0.98, ident


def test_msa_unitig_improves_backbone():
    rng = np.random.default_rng(3)
    truth = random_genome(rng, 6000)
    reads, offs, bb = [], [], []
    for start in range(0, 5000, 600):
        reads.append(mutate_read(rng, truth[start:start + 1800], 0.12))
        offs.append(start)
        bb.append(True)
    unit = LayUnitig("u", reads, offs, bb)
    cns = msa_unitig(unit, MsaParams())
    from difflib import SequenceMatcher
    from smartdenovo_tpu.pipeline.cns import _gen_backbone

    def ident(x):
        return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(truth),
                               autojunk=False).ratio()

    assert ident(cns) > ident(_gen_backbone(unit)), (ident(cns), ident(_gen_backbone(unit)))

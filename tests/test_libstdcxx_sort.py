"""Differential test of the libstdc++ introsort replica against a real
compiled std::sort (built on demand; skipped when no compiler)."""

import shutil
import subprocess

import numpy as np
import pytest

from alga_tpu.utils.libstdcxx_sort import libstdcxx_sort

CPP = r"""
#include <algorithm>
#include <cstdio>
#include <vector>
int main() {
    int n;
    while (scanf("%d", &n) == 1 && n > 0) {
        std::vector<std::pair<long long,int>> v(n);
        for (int i = 0; i < n; i++) { scanf("%lld", &v[i].first); v[i].second = i; }
        std::sort(v.begin(), v.end(), [](const std::pair<long long,int> &a,
                                         const std::pair<long long,int> &b){ return a.first > b.first; });
        for (int i = 0; i < n; i++) printf("%d ", v[i].second);
        printf("\n"); fflush(stdout);
    }
    return 0;
}
"""


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = tmp_path_factory.mktemp("sort")
    src = d / "s.cpp"
    src.write_text(CPP)
    exe = d / "s"
    subprocess.run(["g++", "-O2", "-o", str(exe), str(src)], check=True)
    return str(exe)


@pytest.mark.parametrize("seed", range(6))
def test_matches_std_sort(oracle, seed):
    rng = np.random.default_rng(seed)
    lines = []
    cases = []
    for n in [2, 5, 16, 17, 32, 33, 64, 100, 257, 1000]:
        keys = rng.integers(0, max(2, n // 3), size=n).tolist()  # many ties
        cases.append(keys)
        lines.append(f"{n}\n" + " ".join(map(str, keys)))
    out = subprocess.run([oracle], input="\n".join(lines) + "\n0\n",
                         capture_output=True, text=True, check=True).stdout
    results = [list(map(int, l.split())) for l in out.strip().splitlines()]
    for keys, want in zip(cases, results):
        items = list(enumerate(keys))  # (tag, key)
        got = libstdcxx_sort(items, lambda a, b: a[1] > b[1])
        assert [t for t, _ in got] == want, f"n={len(keys)}"


def test_sorted_output_is_sorted():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, size=500).tolist()
    out = libstdcxx_sort(keys, lambda a, b: a > b)
    assert out == sorted(keys, reverse=True)

"""Scheme (ctl) frontend tests.

Covers the reader/evaluator language subset, `(make ...)` object
construction against the Python classes, and end-to-end parity: a ctl
script must drive the very same Simulation the Python API builds
(reference scheme/meep.scm.in + scheme/examples/*.ctl are the behavioral
model; scripts here are original, written to exercise the same forms)."""

import math

import numpy as np
import pytest

import meep_nl_tpu as mp
from meep_nl_tpu.frontend import (SchemeError, make_ctl_env, run_ctl_string)
from meep_nl_tpu.frontend.interp import eval_program, standard_env
from meep_nl_tpu.frontend.sexp import Symbol, parse_all, parse_one


# ---------------------------------------------------------------------------
# reader


def test_reader_atoms_and_lists():
    forms = parse_all('(define x 3) (set! y (+ x 1.5e-2)) "a;b" #t #f')
    assert forms[0] == [Symbol("define"), Symbol("x"), 3]
    assert forms[1][2] == [Symbol("+"), Symbol("x"), 0.015]
    assert forms[2] == "a;b" and forms[3] is True and forms[4] is False


def test_reader_comments_quote():
    forms = parse_all("; line\n'(1 2) #| block #| nested |# |# `(a ,(+ 1 2))")
    assert forms[0] == [Symbol("quote"), [1, 2]]
    assert forms[1][0] == Symbol("quasiquote")


def test_reader_keyword():
    form = parse_one("(f #:eig-parity 3)")
    from meep_nl_tpu.frontend.sexp import Keyword
    assert isinstance(form[1], Keyword) and str(form[1]) == "eig-parity"


# ---------------------------------------------------------------------------
# evaluator


def run_scm(text, params=None):
    env = standard_env()
    if params:
        env["__ctl_params__"].update(params)
    return eval_program(text, env)


def test_eval_arith_and_compare():
    assert run_scm("(+ 1 2 3)") == 6
    assert run_scm("(- 10 1 2)") == 7
    assert run_scm("(/ 2)") == 0.5
    assert run_scm("(< 1 2 3)") is True
    assert run_scm("(expt 2 10)") == 1024


def test_eval_named_let_tail_recursion_deep():
    # ctl time loops recurse tens of thousands deep; must not blow the stack
    assert run_scm(
        "(let loop ((i 0) (acc 0))"
        "  (if (= i 100000) acc (loop (+ i 1) (+ acc 1))))") == 100000


def test_eval_do_loop_and_cond_case():
    assert run_scm("(do ((i 0 (+ i 1)) (s 0 (+ s i))) ((= i 5) s))") == 10
    assert run_scm("(cond ((= 1 2) 'a) ((= 1 1) 'b) (else 'c))") == \
        Symbol("b")
    assert run_scm("(case (+ 1 2) ((1 2) 'low) ((3 4) 'mid) (else 'hi))") \
        == Symbol("mid")


def test_eval_define_param_override():
    assert run_scm("(define-param n 5) (* n 2)") == 10
    assert run_scm("(define-param n 5) (* n 2)", params={"n": 7}) == 14


def test_eval_map_fold_sort():
    assert run_scm("(map (lambda (x y) (+ x y)) (list 1 2) (list 10 20))") \
        == [11, 22]
    assert run_scm("(fold-left + 0 (list 1 2 3))") == 6
    assert run_scm("(sort (list 3 1 2) <)") == [1, 2, 3]
    assert run_scm("(filter odd? (list 1 2 3 4 5))") == [1, 3, 5]


def test_eval_string_and_misc():
    assert run_scm('(string-append "a" (number->string 2) "b")') == "a2b"
    env, _ = make_ctl_env()
    assert eval_program("(interpolate 1 (list 0 4))", env) == \
        pytest.approx([0, 2, 4])


def test_eval_error_raises():
    with pytest.raises(SchemeError):
        run_scm('(error "boom" 42)')


# ---------------------------------------------------------------------------
# ctl bindings: vector3 / make / input vars


def test_vector3_algebra():
    env, _ = make_ctl_env()
    v = eval_program("(vector3+ (vector3 1 2 3) (vector3-scale 2 "
                     "(vector3 1 0 0)))", env)
    assert (v.x, v.y, v.z) == (3, 2, 3)
    assert eval_program("(vector3-dot (vector3 1 2 3) (vector3 1 1 1))",
                        env) == 6
    c = eval_program("(vector3-cross (vector3 1 0 0) (vector3 0 1 0))", env)
    assert (c.x, c.y, c.z) == (0, 0, 1)
    r = eval_program("(rotate-vector3 (vector3 0 0 1) (/ pi 2)"
                     " (vector3 1 0 0))", env)
    assert abs(r.y - 1) < 1e-12 and abs(r.x) < 1e-12
    assert eval_program("(vector3-close? (unit-vector3 (vector3 3 4 0))"
                        " (vector3 0.6 0.8 0) 1e-12)", env) is True


def test_matrix3x3():
    env, _ = make_ctl_env()
    out = eval_program(
        "(matrix3x3* (rotation-matrix3x3 (vector3 0 0 1) (/ pi 2))"
        " (vector3 1 0 0))", env)
    assert abs(out.y - 1) < 1e-12


def test_make_medium_and_susceptibility():
    env, _ = make_ctl_env()
    m = eval_program(
        "(make medium (epsilon 4) (D-conductivity 2)"
        " (E-susceptibilities (make lorentzian-susceptibility"
        "   (frequency 1.1) (gamma 1e-5) (sigma 0.5))"
        "  (make drude-susceptibility (frequency 0.2) (gamma 0.1)"
        "   (sigma 3))))", env)
    assert isinstance(m, mp.Medium)
    assert m.epsilon == 4 and m.D_conductivity == 2
    assert len(m.E_susceptibilities) == 2
    lor = m.E_susceptibilities[0]
    assert lor.frequency == 1.1 and lor.sigma == 0.5
    assert isinstance(m.E_susceptibilities[1], mp.DrudeSusceptibility)


def test_make_dielectric_index_and_chi3():
    env, _ = make_ctl_env()
    m = eval_program("(make dielectric (index 2) (chi3 0.01))", env)
    assert m.epsilon == pytest.approx(4) and m.chi3 == 0.01


def test_make_geometry_objects():
    env, _ = make_ctl_env()
    b = eval_program(
        "(make block (center 1 2) (size 3 4 infinity)"
        " (material (make dielectric (epsilon 12))))", env)
    assert isinstance(b, mp.Block)
    assert (b.center.x, b.center.y) == (1, 2)
    assert b.size.z >= 1e19
    c = eval_program("(make cylinder (center 0 0) (radius 0.2)"
                     " (height infinity) (material (make medium"
                     " (epsilon 9))))", env)
    assert isinstance(c, mp.Cylinder) and c.radius == 0.2


def test_make_source_and_pml():
    env, _ = make_ctl_env()
    s = eval_program(
        "(make source (src (make gaussian-src (frequency 0.15)"
        " (fwidth 0.1))) (component Ez) (center -2 0) (size 0 1)"
        " (amplitude 2.0))", env)
    assert isinstance(s, mp.Source) and s.component == mp.Ez
    assert isinstance(s.src, mp.GaussianSource) and s.src.fwidth == 0.1
    assert s.amplitude == 2.0
    p = eval_program("(make pml (thickness 1.0) (direction X) (side Low))",
                     env)
    assert isinstance(p, mp.PML) and p.thickness == 1.0
    assert p.direction == mp.X


def test_make_amp_func_scheme_lambda():
    env, _ = make_ctl_env()
    s = eval_program(
        "(define (taper p) (exp (- (vector3-dot p p))))"
        "(make source (src (make continuous-src (frequency 0.2)))"
        " (component Ez) (center 0 0) (size 0 2) (amp-func taper))", env)
    assert abs(s.amp_func(np.array([0.0, 0.0, 0.0])) - 1.0) < 1e-12
    assert abs(s.amp_func(np.array([1.0, 0.0, 0.0])) -
               math.exp(-1)) < 1e-12


def test_make_symmetries_and_parity_sum():
    env, _ = make_ctl_env()
    sym = eval_program("(make mirror-sym (direction Y) (phase -1))", env)
    assert isinstance(sym, mp.Mirror) and sym.phase == -1
    par = eval_program("(+ ODD-Z EVEN-Y)", env)
    from meep_nl_tpu.frontend.bindings import _reduce_parity
    assert _reduce_parity(par) == "TM"


def test_input_vars_build_sim():
    env, state = make_ctl_env()
    eval_program(
        "(set! geometry-lattice (make lattice (size 4 4 no-size)))"
        "(set! resolution 8)"
        "(set! pml-layers (list (make pml (thickness 0.5))))"
        "(set! k-point (vector3 0.25 0 0))", env)
    sim = state.get_sim()
    assert sim.resolution == 8
    assert tuple(np.round([sim.cell_size.x, sim.cell_size.y,
                           sim.cell_size.z], 6)) == (4, 4, 0)
    assert sim.k_point is not None


# ---------------------------------------------------------------------------
# end-to-end: ctl run == python-API run


CTL_WVG = r"""
(set! geometry-lattice (make lattice (size 8 4 no-size)))
(set! geometry (list (make block (center 0 0) (size infinity 1 infinity)
                       (material (make dielectric (epsilon 12))))))
(set! sources (list (make source
                      (src (make gaussian-src (frequency 0.25) (fwidth 0.1)))
                      (component Ez) (center -2.5 0) (size 0 1))))
(set! pml-layers (list (make pml (thickness 1.0))))
(set! resolution 8)
(define trans (add-flux 0.25 0.1 3 (make flux-region (center 2.5 0)
                                     (size 0 2))))
(run-sources+ 10)
(define fluxes (get-fluxes trans))
(define freqs (get-flux-freqs trans))
"""


def python_wvg():
    sim = mp.Simulation(
        cell_size=mp.Vector3(8, 4, 0), resolution=8,
        geometry=[mp.Block(center=mp.Vector3(0, 0),
                           size=mp.Vector3(1e20, 1, 1e20),
                           material=mp.Medium(epsilon=12))],
        sources=[mp.Source(mp.GaussianSource(0.25, fwidth=0.1), mp.Ez,
                           center=mp.Vector3(-2.5, 0),
                           size=mp.Vector3(0, 1))],
        boundary_layers=[mp.PML(1.0)])
    trans = sim.add_flux(0.25, 0.1, 3,
                         mp.FluxRegion(center=mp.Vector3(2.5, 0),
                                       size=mp.Vector3(0, 2)))
    sim.run(until_after_sources=10)
    return np.asarray(mp.get_flux_freqs(trans)), sim.get_fluxes(trans)


def test_ctl_flux_matches_python_api():
    env, state = run_ctl_string(CTL_WVG)
    freqs_py, flux_py = python_wvg()
    assert np.allclose(env["freqs"], freqs_py, rtol=0, atol=0)
    assert np.allclose(env["fluxes"], flux_py, rtol=1e-12, atol=0)
    assert state.run_index == 1


CTL_HARMINV = r"""
(set! geometry-lattice (make lattice (size 6 6 no-size)))
(set! geometry (list (make cylinder (center 0 0) (radius 1.0)
                       (height infinity)
                       (material (make dielectric (epsilon 12))))))
(set! sources (list (make source
                      (src (make gaussian-src (frequency 0.3) (fwidth 0.2)))
                      (component Ez) (center 0.35 0.2))))
(set! pml-layers (list (make pml (thickness 1.0))))
(set! resolution 8)
(run-sources+ 60
  (after-sources (harminv Ez (vector3 0.35 0.2) 0.3 0.2)))
(define qs (map harminv-Q harminv-results))
(define fs (map harminv-freq-re harminv-results))
"""


def test_ctl_harminv_resonator():
    env, state = run_ctl_string(CTL_HARMINV)
    fs, qs = env["fs"], env["qs"]
    assert len(fs) >= 1
    # a resonance inside the source band with a physically positive Q
    assert any(0.2 < f < 0.4 and q > 0 for f, q in zip(fs, qs))


CTL_STOP_DECAY = r"""
(set! geometry-lattice (make lattice (size 6 3 no-size)))
(set! sources (list (make source
                      (src (make gaussian-src (frequency 0.4) (fwidth 0.2)))
                      (component Ez) (center 0 0))))
(set! pml-layers (list (make pml (thickness 0.75))))
(set! resolution 8)
(run-sources+ (stop-when-fields-decayed 5 Ez (vector3 0 0) 1e-3))
(define t-final (meep-time))
"""


def test_ctl_stop_when_fields_decayed():
    env, state = run_ctl_string(CTL_STOP_DECAY)
    assert env["t-final"] > 0
    assert np.isfinite(env["t-final"])


def test_ctl_step_functions_and_custom_lambda():
    prog = r"""
(set! geometry-lattice (make lattice (size 4 4 no-size)))
(set! sources (list (make source
                      (src (make continuous-src (frequency 0.3)))
                      (component Ez) (center 0 0))))
(set! pml-layers (list (make pml (thickness 0.5))))
(set! resolution 8)
(define n-calls 0)
(run-until 5 (at-every 1.0 (lambda () (set! n-calls (+ n-calls 1)))))
"""
    env, state = run_ctl_string(prog)
    # ~5 time units at dt-spacing 1.0 -> >= 4 invocations
    assert env["n-calls"] >= 4


def test_ctl_get_epsilon_point():
    prog = r"""
(set! geometry-lattice (make lattice (size 4 4 no-size)))
(set! geometry (list (make block (center 1 1) (size 2 2 infinity)
                       (material (make dielectric (epsilon 9))))))
(set! resolution 8)
(set! eps-averaging? false)
(init-fields)
(define eps-in (get-epsilon-point (vector3 1 1)))
(define eps-out (get-epsilon-point (vector3 -1 -1)))
"""
    env, _ = run_ctl_string(prog)
    assert env["eps-in"] == pytest.approx(9, rel=0.35)
    assert env["eps-out"] == pytest.approx(1, rel=0.05)


def test_ctl_run_k_points_band():
    prog = r"""
(set! geometry-lattice (make lattice (size 1 4 no-size)))
(set! sources (list (make source
                      (src (make gaussian-src (frequency 0.25) (fwidth 0.2)))
                      (component Ez) (center 0.12 0.15))))
(set! pml-layers '())
(set! resolution 8)
(define all-freqs (run-k-points 40 (list (vector3 0.25 0 0))))
"""
    env, _ = run_ctl_string(prog)
    freqs = env["all-freqs"]
    assert len(freqs) == 1 and len(freqs[0]) >= 1
    # the clean (high-Q) mode sits on the vacuum light line: f = c*kx = 0.25
    clean = [f for f in freqs[0]
             if abs(f.imag) < 1e-4 * max(abs(f.real), 1e-30)]
    assert any(abs(f.real - 0.25) < 0.01 for f in clean)


def test_cli_param_override(tmp_path, capsys):
    script = tmp_path / "t.ctl"
    script.write_text('(define-param a 1)\n(print "a=" a "\\n")\n')
    from meep_nl_tpu.frontend.__main__ import main
    assert main([str(script), "a=42"]) == 0
    assert "a=42" in capsys.readouterr().out

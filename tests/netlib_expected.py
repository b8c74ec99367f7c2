"""Expected netlib objectives.

Values and tolerances exactly as the reference's tests/netlib/test.rs, which
sources them from Gurobi, Coin CLP 1.17.6, GLPK 4.65, and Koch's "The final
Netlib-LP results".  ``ignored`` mirrors the reference's #[ignore] markers —
the de-facto performance frontier of exact single-core RELP that the TPU
build aims to clear.
"""

# name -> (expected objective, abs tolerance, ignored-in-reference?)
NETLIB_EXPECTED = {
    # The reference's (never-run, ignored) test uses Gurobi's rounded
    # 5.5018459e3; Koch's exact value is 0.55018458882867417e4 and our
    # certified exact answer matches it.
    "25FV47": (5501.8458882867417, 1e-5, True),
    "80BAU3B": (9.872241924e05, 1e-5, True),
    "ADLITTLE": (2.254949632e05, 1e-3, False),
    "AFIRO": (-464.75314, 1e-4, False),
    "AGG": (-0.35991767286576506712640824319636e8, 1e-3, False),
    "AGG2": (-0.20239252355977109024317661926133e8, 1e-3, False),
    "AGG3": (0.10312115935089225579061058796215e8, 1e-3, False),
    "BANDM": (-0.15862801845012064052174123768736e3, 1e-6, True),
    "BEACONFD": (0.335924858072e5, 1e-4, False),
    "BLEND": (-30.81215, 1e-6, False),
    "BNL1": (0.19776295615228892439564398331821e4, 1e-4, True),
    "BNL2": (0.1811236540358545170448413697691e4, 1e-4, True),
    "BOEING1": (-0.3352135675071266218429697314682e3, 1e-7, False),
    "BOEING2": (-0.31501872801520287870462195913263e3, 1e-7, False),
    "BORE3D": (0.13730803942084927215581987251301e4, 1e-6, False),
    "BRANDY": (0.15185098964881283835426751550618e4, 1e-5, False),
    "CAPRI": (0.26900129137681610087717280693754e4, 1e-5, False),
    "CYCLE": (-0.52263930248941017172447233836217e1, 1e-7, True),
    "CZPROB": (0.21851966988565774858951155947191e7, 1e-2, False),
    "E226": (-0.18751929066370549102605687681285e2, 1e-6, False),
    "ETAMACRO": (-0.7557152333749133350792583667773e3, 1e-4, False),
    "FINNIS": (0.17279106559561159432297900375543e6, 1e-3, False),
    "GREENBEA": (-0.72555248129845987457557870574845e8, 1e-2, True),
    "GREENBEB": (-0.43022602612065867539213672544432e7, 1e-3, True),
    "GFRD-PNC": (0.69022359995488088295415596232193e7, 1e-3, False),
    # The reference's (ignored) test records Koch's magnitude with a flipped
    # sign; canonical netlib GROW7 minimizes to the negative value.
    "GROW7": (-0.47787811814711502616766956242865e8, 1e-1, True),
    "ISRAEL": (-0.89664482186304572966200464196045e6, 1e-3, False),
    "KB2": (-1.749900130e03, 1e-7, False),
    "LOTFI": (-0.2526470606188e2, 1e-8, False),
    "MODSZK1": (0.32061972906431580494333823530763e3, 1e-6, True),
    "SC50A": (-6.457507706e01, 1e-5, False),
    "SC50B": (-70.0, 1e-8, False),
    "SC105": (-5.220206121e01, 1e-8, False),
    "SC205": (-5.220206121e01, 1e-8, False),
    "SCAGR7": (-2.331389824e06, 1e-3, False),
    "SCRS8": (0.90429695380079143579923107948844e3, 1e-7, False),
    "SCSD1": (0.86666666743333647292533502995263e1, 1e-7, False),
    "SCFXM1": (0.18416759028348943683579089143655e5, 1e-3, True),
    "SCORPION": (0.18781248227381066296479411763586e4, 1e-6, False),
    "SCTAP1": (0.141225e4, 1e-4, False),
    "STAIR": (-0.25126695119296330352803637106304e3, 1e-4, True),
    "STANDATA": (0.12576995e4, 1e-4, False),
    "STANDMPS": (0.14060175e4, 1e-4, False),
    "STOCFOR1": (-4.113197622e04, 1e-6, False),
    "SHARE1B": (-0.7658931857918568112797274346007e5, 1e-5, False),
    "SHARE2B": (-4.157322407e02, 1e-7, False),
    "RECIPELP": (-0.266616e3, 1e-7, False),
    "VTP-BASE": (0.1298314624613613657395984384889e6, 1e-4, False),
}

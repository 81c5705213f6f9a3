"""Golden cross-checks of Cartpole2L against BOTH reference 2-link models.

Round-4 decode (see models/cartpole.py Cartpole2L docstring): the default
Cartpole2L reproduces the analytic torch model envs_v1.py:226-330
(midpoint point masses, from-horizontal angles there; from-down here via
theta = a + pi/2), and Cartpole2L.pkg() reproduces the CasADi C package
my_envs/cartpole2l/src/generated_dynamics.c (the reference's LIVE cp2
training robot: tip masses + m*l^2 link inertia, cart M=10, RK4).

The golden vectors below were computed by running the reference models
directly (torch envs_v1 / the generated C compiled with gcc and called
via ctypes) on 2026-08-19; states/controls are in THIS repo's from-down
convention. Guards the transcription without importing torch/reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_qp_mpc_tpu.models import Cartpole2L

X = np.array([[-0.7673527466957539, 1.9883332331600923, -0.0882755364039729, 0.5398414300611547, -0.1915113489894542, -0.03497496439732228], [-1.1693260449825391, 3.1112845111574847, 1.0603359656240785, 0.8419082145042689, 0.5519147285299646, -0.9390334275144601], [0.945370008684195, 3.998762846564584, -0.8037921177714549, 0.3176016331763907, -1.1508393293010415, -0.9198305549279611], [-0.440718452129903, 2.3205821896096417, 0.6215510115852128, 0.7638608588739444, -0.3729012216978781, -0.43488288753015925]])
U = np.array([[-3.106710144042717], [-3.3283748534235436], [1.7018074855107432], [0.7963471700612441]])
F_V1 = np.array([[-0.7423072117021883, 1.9558979793659037, -0.04600980880269046, 0.4651527820507245, -1.1117683568910868, 1.7473417934701607], [-1.1283236007184057, 3.132057287273981, 1.046395534427747, 0.7984200850711368, 0.2805869032829112, 0.3835102185539745], [0.9622973305171992, 3.9551043220294497, -0.8783084563570217, 0.3599038958290828, -0.6064214034379473, -2.055062029028856], [-0.40340807437972537, 2.282682115567, 0.6429294730025233, 0.7299390678080767, -1.1367128904448165, 1.2586706611577592]])
F_PKG = np.array([[-0.7411885422181019, 1.9718808770172669, -0.08566014876486468, 0.5071161111244105, -0.466830155925339, 0.139948487515522], [-1.1275628739168007, 3.137634543520085, 1.0199394448895314, 0.828860357025188, 0.5030039651806721, -0.6778749266295818], [0.9617411379693837, 3.9463977492329345, -0.8558307962146825, 0.3377718347432421, -0.9453100440322022, -1.1641595399119533], [-0.40303350278344213, 2.295570439099963, 0.6071530178228464, 0.7437525036290429, -0.6280186574794118, -0.14228158304160554]])


@pytest.mark.parametrize("model,golden", [
    (Cartpole2L(), F_V1),
    (Cartpole2L.pkg(), F_PKG),
], ids=["envs_v1", "pkg"])
def test_cartpole2l_matches_reference_golden(model, golden):
    # conftest.py enables x64 globally
    out = np.asarray(model(jnp.asarray(X, jnp.float64),
                           jnp.asarray(U, jnp.float64)), np.float64)
    np.testing.assert_allclose(out, golden, atol=5e-9, rtol=0)

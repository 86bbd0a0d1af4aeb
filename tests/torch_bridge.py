"""Weight-transplant helpers: torch modules (the reference, used as a test
oracle only) -> our param pytrees. Test infrastructure, not framework code."""
import jax.numpy as jnp

from pctd_tpu.ops import GRUParams


def t2j(t):
    return jnp.asarray(t.detach().numpy())


def from_linear(lin):
    return {"w": t2j(lin.weight).T, "b": t2j(lin.bias)}


def from_gru(gru, reverse=False):
    sfx = "_reverse" if reverse else ""
    return GRUParams(
        w_ih=t2j(getattr(gru, f"weight_ih_l0{sfx}")).T,
        w_hh=t2j(getattr(gru, f"weight_hh_l0{sfx}")).T,
        b_ih=t2j(getattr(gru, f"bias_ih_l0{sfx}")),
        b_hh=t2j(getattr(gru, f"bias_hh_l0{sfx}")),
    )


def from_conv2d(conv):
    # torch OIHW -> HWIO
    return {"w": t2j(conv.weight).transpose(2, 3, 1, 0),
            "b": t2j(conv.bias)}


def chord_encoder_params(ref):
    """reference RnnEncoder -> pctd chord_encoder params."""
    return {
        "gru_fwd": from_gru(ref.gru),
        "gru_bwd": from_gru(ref.gru, reverse=True),
        "mu": from_linear(ref.linear_mu),
        "std": from_linear(ref.linear_var),
    }


def texture_conv_params(ref):
    """reference TextureEncoder -> pctd texture_encoder conv params."""
    return {
        "conv": from_conv2d(ref.cnn[0]),
        "fc1": from_linear(ref.fc1),
        "fc2": from_linear(ref.fc2),
        "gru_fwd": from_gru(ref.gru),
        "gru_bwd": from_gru(ref.gru, reverse=True),
        "mu": from_linear(ref.linear_mu),
        "std": from_linear(ref.linear_var),
    }


def texture_pianotree_params(ref):
    """reference PtvaeEncoder -> pctd texture_encoder pianotree params."""
    return {
        "note_emb": from_linear(ref.note_embedding),
        "notes_fwd": from_gru(ref.enc_notes_gru),
        "notes_bwd": from_gru(ref.enc_notes_gru, reverse=True),
        "time_fwd": from_gru(ref.enc_time_gru),
        "time_bwd": from_gru(ref.enc_time_gru, reverse=True),
        "mu": from_linear(ref.linear_mu),
        "std": from_linear(ref.linear_std),
    }


def chord_decoder_params(ref):
    """reference RnnDecoder -> pctd chord_decoder params."""
    return {
        "z2hid": from_linear(ref.z2dec_hid),
        "z2in": from_linear(ref.z2dec_in),
        "gru": from_gru(ref.gru),
        "root": from_linear(ref.root_out),
        "chroma": from_linear(ref.chroma_out),
        "bass": from_linear(ref.bass_out),
        "init_input": t2j(ref.init_input),
    }


def pianotree_decoder_params(ref):
    """reference PtvaeDecoder -> pctd pianotree_decoder params."""
    return {
        "note_emb": from_linear(ref.note_embedding),
        "z2hid": from_linear(ref.z2dec_hid_linear),
        "z2in": from_linear(ref.z2dec_in_linear),
        "emb_fwd": from_gru(ref.dec_notes_emb_gru),
        "emb_bwd": from_gru(ref.dec_notes_emb_gru, reverse=True),
        "time_gru": from_gru(ref.dec_time_gru),
        "time2notes": from_linear(ref.dec_time_to_notes_hid),
        "notes_gru": from_gru(ref.dec_notes_gru),
        "pitch_out": from_linear(ref.pitch_out_linear),
        "dur_gru": from_gru(ref.dec_dur_gru),
        "dur_hid": from_linear(ref.dur_hid_linear),
        "dur_out": from_linear(ref.dur_out_linear),
        "init_input": t2j(ref.dec_init_input),
        "dur_sos": t2j(ref.dur_sos_token),
    }

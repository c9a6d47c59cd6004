"""Model zoo: speaker captioners (fc / att2in2), listener (vse fc), joint model.

Factory mirrors the reference's `models.setup` mapping (ref: models/__init__.py:14-33):
  caption_model: 'fc' -> FCModel, 'att2in2' -> Att2in2Model
  vse_model:     'fc' -> VSEFCModel
"""

from cooperativeimagecaptioning_tpu.models import fc_model, att_model, vse


def setup(opt, name, model_type):
    """Return the model module (init/apply namespace) for a model name.

    ref: models/__init__.py:14-33 — same name->class mapping, functional modules
    instead of nn.Module classes.
    """
    if model_type == "caption_model":
        if name == "fc":
            return fc_model
        if name == "att2in2":
            return att_model
        raise ValueError(f"caption model not supported: {name}")
    if model_type == "vse_model":
        if name == "fc":
            return vse
        raise ValueError(f"vse model not supported: {name}")
    raise ValueError(f"model_type not supported: {model_type}")

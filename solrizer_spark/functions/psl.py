"""Pinned public-suffix snapshot for eTLD+1 extraction.

A static subset of the Public Suffix List (publicsuffix.org — public
data) covering the second-level registration conventions of the major
ccTLD registries, embedded so :func:`urls.registered_domain` resolves
``a.b.co.uk`` → ``b.co.uk`` without network access or external files.

Scale/accuracy notes:

* The suffixes reach executors as an ``IN``-set literal inside the
  serialized plan (Catalyst converts >10 literals to ``InSet``, a hash
  probe) — effectively a broadcast of the dim with zero join and zero
  shuffle, the right shape for a per-row column function.
* A production deployment that needs the FULL list (≈10k entries,
  incl. wildcard rules and private-section suffixes like
  ``github.io``) should pin the upstream ``public_suffix_list.dat``
  into its image and pass ``suffixes=load_psl_file(path)`` to
  ``registered_domain``; the embedded snapshot is the fallback and
  the two agree wherever the snapshot has an entry.
* Only two-label public suffixes are included in the SNAPSHOT;
  ``registered_domain`` also honors three-label rules (longest match
  first) when a full-list set supplies them.
"""

from __future__ import annotations

__all__ = ["PSL_TWO_LEVEL_SNAPSHOT", "load_psl_file"]

#: second-level public suffixes, grouped by registry; pinned snapshot
PSL_TWO_LEVEL_SNAPSHOT: frozenset[str] = frozenset(
    """
    co.uk org.uk me.uk net.uk ltd.uk plc.uk ac.uk gov.uk sch.uk nhs.uk
    com.au net.au org.au edu.au gov.au asn.au id.au
    co.jp ne.jp or.jp go.jp ac.jp ad.jp ed.jp gr.jp lg.jp
    com.br net.br org.br gov.br edu.br art.br blog.br eco.br
    co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in gov.in mil.in
    com.cn net.cn org.cn gov.cn edu.cn ac.cn
    com.mx org.mx net.mx gob.mx edu.mx
    co.nz net.nz org.nz govt.nz ac.nz school.nz gen.nz geek.nz maori.nz iwi.nz
    co.za net.za org.za gov.za edu.za ac.za web.za
    com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar
    com.tr net.tr org.tr gov.tr edu.tr bel.tr pol.tr web.tr
    co.kr ne.kr or.kr go.kr re.kr pe.kr ac.kr ms.kr hs.kr es.kr
    com.tw net.tw org.tw gov.tw edu.tw idv.tw game.tw club.tw
    com.hk net.hk org.hk gov.hk edu.hk idv.hk
    com.sg net.sg org.sg gov.sg edu.sg per.sg
    com.my net.my org.my gov.my edu.my name.my
    co.id net.id or.id go.id ac.id web.id sch.id my.id biz.id
    com.ph net.ph org.ph gov.ph edu.ph ngo.ph
    co.th in.th ac.th go.th or.th net.th mi.th
    com.vn net.vn org.vn gov.vn edu.vn ac.vn biz.vn info.vn
    com.eg net.eg org.eg gov.eg edu.eg sci.eg
    com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa
    com.ua net.ua org.ua gov.ua edu.ua in.ua kiev.ua
    com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl biz.pl
    com.co net.co org.co gov.co edu.co nom.co mil.co
    com.pe net.pe org.pe gob.pe edu.pe nom.pe mil.pe
    com.ve net.ve org.ve gob.ve edu.ve info.ve web.ve
    com.uy net.uy org.uy gub.uy edu.uy
    com.ec net.ec org.ec gob.ec edu.ec fin.ec med.ec pro.ec
    com.bo net.bo org.bo gob.bo edu.bo
    com.py net.py org.py gov.py edu.py coop.py
    com.ng net.ng org.ng gov.ng edu.ng i.ng sch.ng
    co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke info.ke
    co.tz or.tz ne.tz go.tz ac.tz sc.tz hotel.tz
    co.ug or.ug ne.ug go.ug ac.ug sc.ug
    com.gh org.gh edu.gh gov.gh mil.gh
    com.et org.et edu.et gov.et net.et biz.et name.et info.et
    co.il org.il net.il gov.il ac.il muni.il k12.il idf.il
    com.pk net.pk org.pk gov.pk edu.pk fam.pk biz.pk web.pk gok.pk
    com.bd net.bd org.bd gov.bd edu.bd ac.bd mil.bd
    com.np org.np gov.np edu.np net.np mil.np
    com.lk org.lk edu.lk gov.lk net.lk int.lk sch.lk ngo.lk web.lk
    co.ir ac.ir org.ir net.ir gov.ir sch.ir id.ir
    com.kw net.kw org.kw gov.kw edu.kw ind.kw emb.kw
    com.qa net.qa org.qa gov.qa edu.qa mil.qa name.qa sch.qa
    co.ae com.ae net.ae org.ae gov.ae ac.ae sch.ae mil.ae
    com.om net.om org.om gov.om edu.om med.om museum.om pro.om
    com.jo net.jo org.jo gov.jo edu.jo mil.jo name.jo sch.jo
    com.lb net.lb org.lb gov.lb edu.lb
    com.sy net.sy org.sy gov.sy edu.sy mil.sy
    com.ly net.ly org.ly gov.ly edu.ly plc.ly med.ly id.ly sch.ly
    co.ma net.ma org.ma gov.ma ac.ma press.ma
    com.tn net.tn org.tn gov.tn edunet.tn ens.tn fin.tn ind.tn info.tn
    com.dz net.dz org.dz gov.dz edu.dz asso.dz art.dz pol.dz
    com.ru net.ru org.ru msk.ru spb.ru
    com.by net.by org.by gov.by minsk.by
    com.kz org.kz edu.kz gov.kz mil.kz net.kz
    com.uz net.uz org.uz gov.uz
    com.ge net.ge org.ge gov.ge edu.ge mil.ge pvt.ge
    com.am net.am org.am
    co.at or.at ac.at gv.at priv.at
    co.hu org.hu info.hu priv.hu sport.hu tm.hu 2000.hu bolt.hu city.hu
    com.gr net.gr org.gr edu.gr gov.gr
    com.cy net.cy org.cy gov.cy ac.cy biz.cy ltd.cy press.cy pro.cy tm.cy
    com.mt net.mt org.mt edu.mt gov.mt
    com.pt net.pt org.pt gov.pt edu.pt int.pt nome.pt publ.pt
    com.es nom.es org.es gob.es edu.es
    gov.it edu.it
    com.ro org.ro nom.ro nt.ro rec.ro store.ro tm.ro www.ro info.ro arts.ro firm.ro
    com.bg net.bg org.bg gov.bg edu.bg
    co.rs org.rs edu.rs in.rs ac.rs gov.rs
    com.hr iz.hr from.hr name.hr
    co.ba org.ba net.ba gov.ba edu.ba
    com.mk org.mk net.mk edu.mk gov.mk inf.mk name.mk
    com.al net.al org.al gov.al edu.al mil.al
    priv.no
    com.fr asso.fr nom.fr prd.fr tm.fr gouv.fr
    com.de ac.be
    gc.ca
    com.sv org.sv gob.sv edu.sv red.sv
    com.gt net.gt org.gt gob.gt edu.gt ind.gt mil.gt
    com.hn net.hn org.hn gob.hn edu.hn mil.hn
    com.ni net.ni org.ni gob.ni edu.ni int.ni nom.ni mil.ni
    com.pa net.pa org.pa gob.pa edu.pa ing.pa abo.pa med.pa nom.pa sld.pa
    com.cr co.cr or.cr go.cr ac.cr fi.cr ed.cr sa.cr
    com.do net.do org.do gob.do edu.do gov.do mil.do sld.do web.do art.do
    com.cu net.cu org.cu gov.cu edu.cu inf.cu
    com.jm net.jm org.jm gov.jm edu.jm mil.jm
    com.tt net.tt org.tt gov.tt edu.tt co.tt
    com.bs net.bs org.bs gov.bs edu.bs we.bs
    com.bb net.bb org.bb gov.bb edu.bb co.bb info.bb store.bb tv.bb biz.bb
    com.fj net.fj org.fj gov.fj ac.fj biz.fj info.fj mil.fj name.fj pro.fj
    com.pg net.pg org.pg gov.pg ac.pg mil.pg
    com.sb net.sb org.sb gov.sb edu.sb
    com.vu net.vu org.vu edu.vu
    com.ws net.ws org.ws gov.ws edu.ws
    co.ck org.ck edu.ck gov.ck net.ck gen.ck biz.ck info.ck
    com.nf net.nf org.nf gov.nf edu.nf arts.nf firm.nf info.nf other.nf per.nf rec.nf store.nf web.nf
    com.kh net.kh org.kh gov.kh edu.kh mil.kh per.kh
    com.la net.la org.la gov.la edu.la int.la info.la per.la
    com.mm net.mm org.mm gov.mm edu.mm
    com.bn net.bn org.bn gov.bn edu.bn
    com.mv net.mv org.mv gov.mv edu.mv aero.mv biz.mv coop.mv info.mv int.mv
    com.af net.af org.af gov.af edu.af
    com.bt net.bt org.bt gov.bt edu.bt
    com.mn org.mn edu.mn gov.mn nyc.mn
    com.kg net.kg org.kg gov.kg mil.kg
    com.tj net.tj org.tj gov.tj edu.tj go.tj int.tj mil.tj name.tj web.tj
    com.tm net.tm org.tm gov.tm edu.tm mil.tm nom.tm co.tm
    com.az net.az org.az gov.az edu.az int.az mil.az name.az pro.az biz.az info.az
    com.iq net.iq org.iq gov.iq edu.iq mil.iq
    com.ye net.ye org.ye gov.ye edu.ye mil.ye
    com.bh net.bh org.bh gov.bh edu.bh
    """
    .split()
)


def load_psl_file(path: str) -> frozenset[str]:
    """Parse a pinned ``public_suffix_list.dat`` into the suffix set
    ``registered_domain`` consumes (multi-label rules from BOTH the
    ICANN and private sections; comments/blank lines skipped;
    wildcard ``*.``/exception ``!`` rules and single-label TLDs — the
    default rule — ignored). For deployments that need full-list
    fidelity beyond the embedded snapshot."""
    out = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//") or line.startswith(("*", "!")):
                continue
            if "." in line:  # single-label TLDs are the default rule
                out.add(line.lower())
    return frozenset(out)
